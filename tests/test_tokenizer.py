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


def test_doc_len_sql_matches_python(spark):
    """The JVM doc_len expression (builder fast path) must equal
    count_terms() doc_len exactly, per mode, across edge cases and the
    fixture corpus."""
    from pyspark.sql import functions as F

    from bright_spark.analysis.tokenizer import count_terms, doc_len_sql
    from bright_spark.fixtures import make_repos

    tricky = [
        "", None, "   ", "HTTPServer2 getUserId parse_config_file",
        "x" * 100 + " ok", "ÄÖÜ über naïve", "snake_case camelCaseId ALLCAPS",
        "a b\tc\nd", "mixed123Numbers456", "_leading __dunder__ trailing_",
        "1a2B3c", "A", "aB", "Ab", "AB", "ABc", "tab\there",
        "x nbsp", "emoji 🙂 mixed",
    ]
    rows = ([{"i": i, "t": t} for i, t in enumerate(tricky)]
            + [{"i": 100 + i, "t": c}
               for i, c in enumerate(make_repos(60, 9)["content"])])
    df = spark.createDataFrame(rows, "i INT, t STRING")
    for mode in ("code", "simple"):
        got = {r["i"]: r["dl"] for r in df.select(
            "i", F.coalesce(F.expr(doc_len_sql("t", mode)),
                            F.lit(0)).alias("dl")).collect()}
        for r in rows:
            assert got[r["i"]] == count_terms(r["t"] or "", mode)[1], (
                mode, r["i"], (r["t"] or "")[:40])
