"""R1-R7 request semantics parity (handlers/search.go:20-177) over the
products fixture (FIXTURES.md F4), including the reference's three
benchmark queries (`benchmark.sh:218-220`)."""

import math

import pytest

from bright_spark.models import SearchRequest, SearchRequestError, SearchResponse


@pytest.fixture(scope="module")
def products_pdf():
    from bright_spark.fixtures import make_products
    pdf = make_products(400, 42)
    pdf["text"] = pdf["name"] + " " + pdf["description"]
    return pdf


@pytest.fixture(scope="module")
def products_engine(spark, products_pdf, tmp_path_factory):
    from bright_spark.index.builder import build_index
    from bright_spark.models import IndexConfig
    from bright_spark.query.engine import SearchEngine
    path = str(tmp_path_factory.mktemp("products") / "src.parquet")
    spark.createDataFrame(products_pdf).write.mode("overwrite").parquet(path)
    idx = str(tmp_path_factory.mktemp("products") / "idx")
    build_index(
        spark, spark.read.parquet(path), idx,
        IndexConfig(id="products", tokenizer="simple"),
        content_col="text", id_col="id", lang_col=None,
        attr_cols=("name", "description", "price", "category", "tags", "inStock"),
        n_build_partitions=4)
    return SearchEngine(spark, idx)


@pytest.fixture(scope="module")
def products_oracle(products_pdf):
    from tests.oracle import OracleIndex
    return OracleIndex(products_pdf.to_dict("records"), content_col="text",
                       id_col="id", lang_col=None, mode="simple")


def test_benchmark_queries_match_oracle(products_engine, products_oracle):
    for q in ["laptop", "computer", "price:>100"]:
        expected, etotal = products_oracle.search(q, 10)
        resp = products_engine.search(SearchRequest(q=q, limit=10))
        assert [h["doc_id"] for h in resp.hits] == [d for d, _ in expected], q
        assert resp.total_hits == etotal


def test_default_limit_is_20(products_engine):
    resp = products_engine.search(SearchRequest(q="laptop"))
    assert resp.limit == 20
    assert len(resp.hits) <= 20


def test_pagination_page_equals_offset(products_engine):
    # page -> offset=(page-1)*limit (handlers/search.go:79-81)
    by_page = products_engine.search(SearchRequest(q="", limit=10, page=3))
    by_offset = products_engine.search(SearchRequest(q="", limit=10, offset=20))
    assert [h["doc_id"] for h in by_page.hits] == [h["doc_id"] for h in by_offset.hits]


def test_total_pages_ceil(products_engine, products_oracle):
    resp = products_engine.search(SearchRequest(q="laptop", limit=7))
    assert resp.total_pages == math.ceil(resp.total_hits / 7)


def test_sort_by_field(products_engine, products_pdf):
    resp = products_engine.search(SearchRequest(q="", sort=["-price"], limit=5))
    prices = sorted(products_pdf["price"].tolist(), reverse=True)[:5]
    got = [h["price"] for h in resp.hits]
    assert got == prices

    asc = products_engine.search(SearchRequest(q="", sort=["price"], limit=5))
    assert [h["price"] for h in asc.hits] == sorted(products_pdf["price"].tolist())[:5]


def test_sort_with_scored_query(products_engine, products_oracle):
    # sort by price among docs matching 'laptop'
    resp = products_engine.search(SearchRequest(q="laptop", sort=["-price"], limit=5))
    all_hits, _ = products_oracle.search("laptop", 10**9)
    matched = {d for d, _ in all_hits}
    expect = sorted((products_oracle.by_id[d][0]["price"], -d) for d in matched)
    expect = [(-neg, p) for p, neg in expect]
    top = sorted(((h["price"], h["doc_id"]) for h in resp.hits),
                 key=lambda x: (-x[0], x[1]))
    assert [p for p, _ in top] == sorted((p for p, _ in
                                          [(products_oracle.by_id[d][0]["price"], d)
                                           for d in matched]), reverse=True)[:5]


def test_attributes_to_retrieve(products_engine):
    resp = products_engine.search(SearchRequest(
        q="laptop", limit=3, attributes_to_retrieve=["name", "price"]))
    for h in resp.hits:
        assert set(h) == {"doc_id", "name", "price", "id", "_score"}


def test_attributes_to_exclude(products_engine):
    resp = products_engine.search(SearchRequest(
        q="laptop", limit=3, attributes_to_exclude=["description", "tags"]))
    for h in resp.hits:
        assert "description" not in h and "tags" not in h
        assert "name" in h


def test_retrieve_exclude_mutually_exclusive():
    # 400 in the reference (handlers/search.go:74-76)
    req = SearchRequest(q="x", attributes_to_retrieve=["a"],
                        attributes_to_exclude=["b"])
    with pytest.raises(SearchRequestError):
        req.validate()


def test_id_injection(products_engine):
    # R5: hits carry an `id` field (search.go:156-158)
    resp = products_engine.search(SearchRequest(q="laptop", limit=3))
    for h in resp.hits:
        assert "id" in h


def test_envelope_shape(products_engine):
    resp = products_engine.search(SearchRequest(q="laptop", limit=5))
    d = resp.to_dict()
    assert set(d) == {"hits", "totalHits", "totalPages"}


def test_invalid_requests():
    with pytest.raises(SearchRequestError):
        SearchRequest(q="x", limit=0).validate()
    with pytest.raises(SearchRequestError):
        SearchRequest(q="x", offset=-1).validate()
    with pytest.raises(SearchRequestError):
        SearchRequest(q="x", page=0).validate()


def test_date_range_query_end_to_end(spark, tmp_path_factory):
    """Q12: `field:[a TO b]` on a DATE attribute column filters hits
    via pushed-down BETWEEN (reference: Bleve datetime range over doc
    values)."""
    import datetime as dt
    from bright_spark.index.builder import build_index
    from bright_spark.models import IndexConfig
    from bright_spark.query.engine import SearchEngine

    rows = [
        {"id": i, "created": dt.date(2021, 1 + (i % 12), 3),
         "body": "release notes update" if i % 2 == 0 else "misc text entry"}
        for i in range(48)
    ]
    src = spark.createDataFrame(rows)
    idx = str(tmp_path_factory.mktemp("dates") / "idx")
    build_index(spark, src, idx,
                IndexConfig(id="dates", tokenizer="simple"),
                content_col="body", id_col="id", lang_col=None,
                attr_cols=("created",), n_build_partitions=2)
    eng = SearchEngine(spark, idx)
    got = {r["doc_id"] for r in
           eng.search_df("created:[2021-03-01 TO 2021-05-31] update",
                         k=50).collect()}
    expect = {r["id"] for r in rows
              if dt.date(2021, 3, 1) <= r["created"] <= dt.date(2021, 5, 31)
              and "update" in r["body"]}
    assert got == expect and got
    # negated range (NOT date-range) excludes the window
    neg = {r["doc_id"] for r in
           eng.search_df("update NOT created:[2021-03-01 TO 2021-05-31]",
                         k=50).collect()}
    assert neg == {r["id"] for r in rows if "update" in r["body"]} - expect


# ---------------------------------------------------------------- R7

def test_from_params_body_overrides_query():
    """R7 (handlers/search.go:39-63): body params override query
    params, but only when non-empty / non-zero."""
    req = SearchRequest.from_params(
        query_params={"q": "laptop", "limit": 5, "offset": 10,
                      "sort[]": ["-price"]},
        body={"q": "phone", "limit": 25,
              "attributesToRetrieve": ["name"]})
    assert req.q == "phone"            # body wins
    assert req.limit == 25             # body wins
    assert req.offset == 10            # body zero-value: query wins
    assert req.sort == ["-price"]      # body empty list: query wins
    assert req.attributes_to_retrieve == ["name"]


def test_from_params_zero_values_do_not_override():
    req = SearchRequest.from_params(
        query_params={"q": "laptop", "offset": 7},
        body={"q": "", "offset": 0, "limit": 0, "page": 0, "sort": []})
    assert req.q == "laptop" and req.offset == 7
    assert req.limit == 20 and req.page == 1  # reference defaults


def test_from_params_page_one_keeps_offset():
    """Reference computes offset from page only `if page > 1`
    (handlers/search.go:79-81): the default page=1 must not clobber an
    explicit offset."""
    req = SearchRequest.from_params(query_params={"offset": 15})
    assert req.page == 1 and req.effective_offset == 15
    req2 = SearchRequest.from_params(query_params={"offset": 15,
                                                   "page": 3, "limit": 10})
    assert req2.effective_offset == 20
