"""S1-S3 format ingestion: jsoneachrow semantics pinned to
formats/jsoneachrow.go (blank lines skipped, malformed -> error),
dispatch to formats/format.go (unknown -> UnsupportedFormatError)."""

import json

import pytest

from bright_spark.sources import UnsupportedFormatError, read_documents


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"id": "1", "name": "laptop", "price": 99.5}),
        "",
        "   ",
        json.dumps({"id": "2", "name": "mouse", "price": 9.0}),
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsoneachrow_skips_blank_lines(spark, jsonl_file):
    df = read_documents(spark, jsonl_file)
    rows = {r["id"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"1", "2"}
    assert rows["1"]["name"] == "laptop"
    assert rows["2"]["price"] == 9.0


def test_jsoneachrow_is_default_format(spark, jsonl_file):
    assert read_documents(spark, jsonl_file, "jsoneachrow").count() == \
        read_documents(spark, jsonl_file).count()


def test_jsoneachrow_malformed_line_errors(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": "1"}\n{not json}\n')
    df = read_documents(spark, str(p), schema="id STRING")
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()


def test_unknown_format_rejected(spark, jsonl_file):
    with pytest.raises(UnsupportedFormatError):
        read_documents(spark, jsonl_file, "csvish")


def test_msgpack_stubbed_without_lib(spark, tmp_path):
    p = tmp_path / "docs.msgpack"
    p.write_bytes(b"\x91\x81\xa2id\xa31")  # [{"id": "1"}]
    pytest.importorskip  # noqa: B018 - document intent
    try:
        import msgpack  # noqa: F401
        have = True
    except ImportError:
        have = False
    if have:  # pragma: no cover - not in this sandbox
        df = read_documents(spark, str(p), "msgpack")
        assert df.count() == 1
    else:
        with pytest.raises(NotImplementedError, match="msgpack"):
            read_documents(spark, str(p), "msgpack").collect()


def test_jsonl_index_build_end_to_end(spark, tmp_path):
    """F4-shaped products corpus through jsoneachrow -> index -> query
    (the reference benchmark flow: POST JSONL then search)."""
    from bright_spark.fixtures import make_products
    from bright_spark.index.builder import build_index
    from bright_spark.models import IndexConfig
    from bright_spark.query.engine import SearchEngine

    pdf = make_products(200, seed=5)
    path = tmp_path / "products.jsonl"
    with open(path, "w") as f:
        for rec in pdf.to_dict("records"):
            f.write(json.dumps(rec) + "\n")
    src = read_documents(spark, str(path))
    idx = str(tmp_path / "idx")
    build_index(spark, src, idx,
                IndexConfig(id="products", tokenizer="simple"),
                content_col="description", key_cols=("id",),
                lang_col=None, attr_cols=("name", "price", "category"),
                n_build_partitions=4)
    eng = SearchEngine(spark, idx)
    hits = eng.search("laptop")
    assert hits.total_hits > 0
    assert all("laptop" in h["description"] for h in hits.hits)
    priced = eng.search_df("price:>100 laptop", mode="relational")
    ids = [r["doc_id"] for r in priced.collect()]
    docs = {r["doc_id"]: r for r in eng.catalog.docs(spark).collect()}
    assert ids and all(docs[i]["price"] > 100 for i in ids)
