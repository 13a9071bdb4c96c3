from bright_spark.analysis.tokenizer import (
    analyze_query_term,
    count_terms,
    tokenize,
    tokenize_with_positions,
)


def test_camel_case_expansion():
    # SURVEY.md T2: getUserId -> get, user, id, getuserid
    assert tokenize("getUserId") == ["get", "user", "id", "getuserid"]


def test_snake_case_expansion():
    assert tokenize("parse_config_file") == ["parse", "config", "file", "parse_config_file"]


def test_single_part_no_dup():
    assert tokenize("hello") == ["hello"]
    assert tokenize("HELLO") == ["hello"]


def test_allcaps_and_digits():
    assert tokenize("HTTPServer2") == ["http", "server", "2", "httpserver2"]


def test_positions_are_base_token_ordinals():
    toks = tokenize_with_positions("getUser parseConfig")
    # subtokens of one identifier share its base position
    assert [(t, p) for t, p in toks] == [
        ("get", 0), ("user", 0), ("getuser", 0),
        ("parse", 1), ("config", 1), ("parseconfig", 1)]


def test_simple_mode_whitespace_lower():
    assert tokenize("The  Fast key", mode="simple") == ["the", "fast", "key"]


def test_stopword_filter_per_lang():
    out = tokenize("def foo return bar", mode="code", lang="python",
                   filter_stopwords=True)
    assert "def" not in out and "return" not in out
    assert "foo" in out and "bar" in out


def test_count_terms_doc_len():
    counts, dl = count_terms("a b a")
    assert counts["a"] == 2 and counts["b"] == 1 and dl == 3


def test_query_term_analysis_keeps_identifier_whole():
    assert analyze_query_term("getUserId") == ["getuserid"]
    assert analyze_query_term("user") == ["user"]


def test_empty_and_none():
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("   \n\t  ") == []
