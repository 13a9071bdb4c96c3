"""API-semantics parity sweep over the products fixture (FIXTURES.md
F4) — the reference's own benchmark-data shape
(`/root/reference/benchmarks/generate_data.go:12-20`), driven through
``IndexStore.search`` exactly like a reference client: the three
benchmark queries (`/root/reference/benchmark.sh:218-220` analogs)
plus sort / pagination / projection / envelope matrices
(handlers/search.go:20-177 semantics R1-R7), each checked against a
pandas re-derivation over the same frame.
"""

import math

import pytest

from bright_spark.fixtures import make_products
from bright_spark.index.store import IndexStore
from bright_spark.models import IndexConfig, SearchRequest, SearchRequestError

N = 400  # plenty for paging matrices, builds in seconds


@pytest.fixture(scope="module")
def products_store(spark, tmp_path_factory):
    pdf = make_products(N, seed=42)
    # _all analog: a bare term must match name OR description, like
    # Bleve's default-mapping search over every analyzed field
    pdf["content"] = pdf["name"] + " " + pdf["description"]
    store = IndexStore(spark, str(tmp_path_factory.mktemp("prod") / "data"))
    store.create_index(IndexConfig(id="products", tokenizer="simple",
                                   n_term_buckets=8))
    store.add_documents(
        "products", spark.createDataFrame(pdf),
        content_col="content", key_cols=("id",), id_col=None,
        lang_col=None,
        attr_cols=("name", "description", "price", "category", "inStock",
                   "id"),
        n_build_partitions=4)
    return store, pdf


def _matches(pdf, term):
    blob = (pdf["name"] + " " + pdf["description"]).str.lower()
    return pdf[blob.str.split().map(lambda ts: term in ts)]


def test_benchmark_queries_hit_counts(products_store):
    """benchmark.sh's three queries: totalHits == brute-force count,
    every hit actually matches."""
    store, pdf = products_store
    for term in ("laptop", "computer"):
        resp = store.search("products", SearchRequest(q=term, limit=5))
        expect = _matches(pdf, term)
        assert resp.total_hits == len(expect), term
        assert len(resp.hits) == min(5, len(expect))
        for h in resp.hits:
            assert term in (h["name"] + " " + h["description"]).lower()
            assert h["_score"] > 0
    resp = store.search("products", SearchRequest(q="price:>100", limit=3))
    assert resp.total_hits == int((pdf["price"] > 100).sum())
    assert all(h["price"] > 100 for h in resp.hits)


def test_sort_matrix(products_store):
    """R2: sort[]=[-]field over a numeric attr, doc-order tiebreak;
    default sort is -_score."""
    store, pdf = products_store
    up = store.search("products", SearchRequest(q="laptop", limit=8,
                                                sort=["price"]))
    prices = [h["price"] for h in up.hits]
    assert prices == sorted(prices)
    down = store.search("products", SearchRequest(q="laptop", limit=8,
                                                  sort=["-price"]))
    dprices = [h["price"] for h in down.hits]
    assert dprices == sorted(dprices, reverse=True)
    # same match set, opposite ends
    assert up.total_hits == down.total_hits == len(_matches(pdf, "laptop"))
    by_score = store.search("products", SearchRequest(q="laptop", limit=8))
    scores = [h["_score"] for h in by_score.hits]
    assert scores == sorted(scores, reverse=True)


def test_pagination_matrix(products_store):
    """R1: offset/limit slices concatenate to the full ranking;
    page>1 overrides offset; totalPages = ceil(total/limit)."""
    store, _ = products_store
    full = store.search("products", SearchRequest(q="laptop", limit=30))
    ids = [h["id"] for h in full.hits]
    assert len(ids) == min(30, full.total_hits) and len(set(ids)) == len(ids)
    a = store.search("products", SearchRequest(q="laptop", limit=10))
    b = store.search("products", SearchRequest(q="laptop", limit=10,
                                               offset=10))
    c = store.search("products", SearchRequest(q="laptop", limit=10, page=3))
    assert [h["id"] for h in a.hits] == ids[:10]
    assert [h["id"] for h in b.hits] == ids[10:20]
    assert [h["id"] for h in c.hits] == ids[20:30]
    assert a.total_pages == math.ceil(a.total_hits / 10)


def test_projection_matrix(products_store):
    """R3/R4/R5: retrieve keeps only listed attrs (+id injection),
    exclude drops listed attrs, both together is a 400."""
    store, _ = products_store
    r = store.search("products", SearchRequest(
        q="laptop", limit=3, attributes_to_retrieve=["name", "price"]))
    for h in r.hits:
        assert set(h) == {"name", "price", "_score", "id", "doc_id"} - {""}
    e = store.search("products", SearchRequest(
        q="laptop", limit=3, attributes_to_exclude=["description", "tags"]))
    for h in e.hits:
        assert "description" not in h and "tags" not in h
        assert "name" in h and "price" in h
    with pytest.raises(SearchRequestError):
        store.search("products", SearchRequest(
            q="laptop", attributes_to_retrieve=["name"],
            attributes_to_exclude=["price"]))


def test_envelope_and_id_semantics(products_store):
    """R5/R6: the products corpus carries its own string id column —
    hits surface it verbatim (no injection needed), and the envelope
    dict has the reference wire keys."""
    store, pdf = products_store
    resp = store.search("products", SearchRequest(q="laptop", limit=4))
    d = resp.to_dict()
    assert set(d) >= {"hits", "totalHits", "totalPages"}
    assert d["totalHits"] == resp.total_hits
    valid_ids = set(pdf["id"])
    for h in resp.hits:
        assert h["id"] in valid_ids
