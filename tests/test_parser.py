from bright_spark.query.parser import parse_query


def test_empty_is_match_all():
    assert parse_query("").is_match_all
    assert parse_query("   ").is_match_all


def test_bare_terms_are_should():
    pq = parse_query("hello world")
    assert [c.value for c in pq.should] == ["hello", "world"]
    assert not pq.must and not pq.must_not


def test_plus_minus_modifiers():
    pq = parse_query("+parse -legacy config")
    assert [c.value for c in pq.must] == ["parse"]
    assert [c.value for c in pq.must_not] == ["legacy"]
    assert [c.value for c in pq.should] == ["config"]


def test_and_promotes_both_sides():
    pq = parse_query("parser AND config")
    assert [c.value for c in pq.must] == ["parser", "config"]


def test_or_keeps_should():
    pq = parse_query("error OR exception")
    assert [c.value for c in pq.should] == ["error", "exception"]


def test_not():
    pq = parse_query("config NOT test")
    assert [c.value for c in pq.should] == ["config"]
    assert [c.value for c in pq.must_not] == ["test"]


def test_field_scoped():
    pq = parse_query("lang:python")
    assert pq.should[0].field_name == "lang"
    assert pq.should[0].value == "python"


def test_phrase():
    pq = parse_query('"hello world"')
    c = pq.should[0]
    assert c.kind == "phrase" and c.value == "hello world"


def test_wildcard_and_fuzzy():
    pq = parse_query("pars* confg~1 exact~")
    kinds = [(c.kind, c.value, c.fuzziness) for c in pq.should]
    assert kinds == [("wildcard", "pars*", 0), ("fuzzy", "confg", 1), ("fuzzy", "exact", 1)]


def test_boost():
    pq = parse_query("parser^2 config")
    assert pq.should[0].boost == 2.0
    assert pq.should[1].boost == 1.0


def test_numeric_range():
    pq = parse_query("price:>100 doc_len:<=3")
    a, b = pq.should
    assert (a.kind, a.field_name, a.op, a.value) == ("range", "price", ">", "100")
    assert (b.kind, b.field_name, b.op, b.value) == ("range", "doc_len", "<=", "3")


def test_between_range():
    pq = parse_query("date:[2020-01-01 TO 2020-12-31]")
    c = pq.should[0]
    assert c.kind == "range" and c.op == "between"
    assert c.value == "2020-01-01" and c.hi == "2020-12-31"


def test_phrase_with_boost():
    pq = parse_query('"hello world"^3')
    c = pq.should[0]
    assert c.kind == "phrase" and c.boost == 3.0


def test_mixed_and_not():
    pq = parse_query("parser AND config NOT test -legacy +core")
    assert [c.value for c in pq.must] == ["parser", "config", "core"]
    assert [c.value for c in pq.must_not] == ["test", "legacy"]


def test_detect_primary_key():
    """U5 auto-detection parity (store/store.go:559-594)."""
    import pytest as _pytest
    from bright_spark.index.builder import detect_primary_key

    class _FakeDF:
        def __init__(self, cols):
            self.columns = cols

    assert detect_primary_key(_FakeDF(["name", "userId", "price"])) == "userId"
    assert detect_primary_key(_FakeDF(["ID", "name"])) == "ID"
    with _pytest.raises(ValueError, match="no primary key"):
        detect_primary_key(_FakeDF(["name", "price"]))
    with _pytest.raises(ValueError, match="multiple"):
        detect_primary_key(_FakeDF(["id", "user_id"]))


def test_escaped_colon_is_literal():
    r"""foo\:bar must parse as ONE term value 'foo:bar', not a field
    prefix (Bleve query-string escaping)."""
    pq = parse_query(r"foo\:bar")
    assert len(pq.should) == 1
    c = pq.should[0]
    assert c.kind == "term" and c.field_name is None
    assert c.value == "foo:bar"


def test_escaped_quote_tilde_caret_star():
    pq = parse_query(r'say\"hi conf\~1 term\^2 pa\*s')
    vals = [(c.kind, c.value) for c in pq.should]
    assert vals == [("term", 'say"hi'), ("term", "conf~1"),
                    ("term", "term^2"), ("term", "pa*s")]
    assert all(c.fuzziness == 0 and c.boost == 1.0 for c in pq.should)


def test_escaped_backslash_and_mixed():
    pq = parse_query(r"a\\b lang:en")
    assert pq.should[0].value == "a\\b"
    assert pq.should[1].field_name == "lang"


def test_unescaped_specials_still_work():
    pq = parse_query('lang:python spark~1 jo*n "a b" boost^2')
    kinds = [c.kind for c in pq.should]
    assert kinds == ["term", "fuzzy", "wildcard", "phrase", "term"]
    assert pq.should[4].boost == 2.0


def test_escape_any_token_roundtrip_property():
    r"""Property (hypothesis): for ANY token, escaping every special
    char yields exactly one term clause whose value is the original
    string — no grammar rule may fire on an escaped char."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    specials = set(':"~^*?+-[]\\')
    alphabet = list("abz09") + list(specials)

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=st.sampled_from(alphabet),
                   min_size=1, max_size=24))
    def check(s):
        escaped = "".join("\\" + c if c in specials else c for c in s)
        pq = parse_query(escaped)
        assert len(pq.should) == 1 and not pq.must and not pq.must_not
        c = pq.should[0]
        assert c.kind == "term", (s, c)
        assert c.value == s
        assert c.field_name is None
        assert c.boost == 1.0 and c.fuzziness == 0

    check()
