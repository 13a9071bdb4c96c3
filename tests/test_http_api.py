"""REST surface parity (main.go:216-252 routes): the reference's
index/document/search API driven over a real HTTP socket — create,
bulk add (build), upsert, search with R1-R7 request semantics
including the body-over-query override, document deletes/patch, error
mapping (400/404), envelope wire keys."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from bright_spark.api.server import make_server
from bright_spark.index.store import IndexStore


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    store = IndexStore(spark, str(tmp_path_factory.mktemp("api") / "data"))
    srv = make_server(store, 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()


def call(base, method, path, body=None, expect=200):
    req = urllib.request.Request(
        base + path, method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_full_api_flow(api):
    base = api
    assert call(base, "GET", "/health") == (200, {"status": "ok"})

    # index lifecycle
    st, _ = call(base, "POST", "/indexes",
                 {"id": "docs", "tokenizer": "simple"})
    assert st == 201
    st, body = call(base, "GET", "/indexes")
    assert st == 200 and body[0]["id"] == "docs"
    st, _ = call(base, "POST", "/indexes", {"id": "docs"})
    assert st == 400  # duplicate
    st, _ = call(base, "GET", "/indexes/nope")
    assert st == 404

    # first batch builds (PK auto-detect: rid), later batch upserts
    rows = [{"rid": i, "content": f"alpha beta doc{i}", "kind": f"k{i % 3}"}
            for i in range(12)]
    st, body = call(base, "POST", "/indexes/docs/documents", rows)
    assert (st, body) == (202, {"received": 12})
    st, body = call(base, "POST", "/indexes/docs/documents",
                    [{"rid": 100, "content": "gamma fresh row",
                      "kind": "k9"}])
    assert st == 202

    # search: query params + body override (R7) + envelope keys (R6)
    st, body = call(base, "POST", "/indexes/docs/searches?q=alpha&limit=2")
    assert st == 200 and body["totalHits"] == 12
    assert len(body["hits"]) == 2 and body["totalPages"] == 6
    assert all("_score" in h and "id" in h for h in body["hits"])
    st, body = call(base, "POST", "/indexes/docs/searches?q=alpha&limit=2",
                    {"q": "gamma", "limit": 5})  # body overrides
    assert st == 200 and body["totalHits"] == 1
    assert body["hits"][0]["doc_id"] == 100  # PK stored as doc_id

    # sort + pagination through the wire
    st, body = call(base, "POST",
                    "/indexes/docs/searches?q=alpha&limit=3&page=2"
                    "&sort[]=-doc_id")
    assert st == 200
    rids = [h["doc_id"] for h in body["hits"]]
    assert rids == [8, 7, 6]  # ids 11..0 desc, page 2 of 3

    # projections: retrieve vs exclude are mutually exclusive (400)
    st, body = call(base, "POST", "/indexes/docs/searches",
                    {"q": "alpha", "attributesToRetrieve": ["kind"],
                     "attributesToExclude": ["content"]})
    assert st == 400

    # document routes
    st, _ = call(base, "DELETE", "/indexes/docs/documents/0")
    assert st == 204
    st, _ = call(base, "DELETE", "/indexes/docs/documents?ids=1,2")
    assert st == 204
    st, body = call(base, "POST", "/indexes/docs/searches?q=alpha")
    assert body["totalHits"] == 9
    st, body = call(base, "PATCH", "/indexes/docs/documents/5",
                    {"content": "patched zeta body"})
    assert st == 200 and body["content"] == "patched zeta body"
    st, body = call(base, "POST", "/indexes/docs/searches?q=zeta")
    assert body["totalHits"] == 1
    st, _ = call(base, "PATCH", "/indexes/docs/documents/99999",
                 {"content": "x"})
    assert st == 404
    st, _ = call(base, "DELETE", "/indexes/docs/documents")
    assert st == 400  # neither ids nor filter

    # index delete
    st, _ = call(base, "DELETE", "/indexes/docs")
    assert st == 204
    st, _ = call(base, "POST", "/indexes/docs/searches?q=alpha")
    assert st == 404


def test_wire_edge_cases(api):
    """Review regressions pinned: numeric-looking terms stay strings,
    malformed numeric params are 400s (not 500s), and PATCH with an
    explicit empty excludeAttributes CLEARS the exclusions."""
    base = api
    st, _ = call(base, "POST", "/indexes",
                 {"id": "edge", "tokenizer": "simple",
                  "excludeAttributes": ["secret"]})
    assert st == 201
    st, body = call(base, "POST", "/indexes/edge/documents?contentCol=text",
                    [{"rid": 1, "text": "code 123 here", "secret": "x"}])
    assert st == 202
    # ?q=123 searches the TERM '123' (int coercion must not touch q)
    st, body = call(base, "POST", "/indexes/edge/searches?q=123")
    assert st == 200 and body["totalHits"] == 1
    # malformed numerics -> 400, not a 500 TypeError
    st, _ = call(base, "POST", "/indexes/edge/searches?q=code&limit=abc")
    assert st == 400
    st, _ = call(base, "POST", "/indexes/edge/searches",
                 {"q": "code", "limit": "abc"})
    assert st == 400
    # PATCH with explicit [] clears exclusions (falsy is not absent)
    st, _ = call(base, "PATCH", "/indexes/edge", {"excludeAttributes": []})
    assert st == 200
    st, body = call(base, "GET", "/indexes/edge")
    assert body["excludeAttributes"] == []
    call(base, "DELETE", "/indexes/edge")
