"""REST surface parity (main.go:216-252 routes): the reference's
index/document/search/ingress API driven over a real HTTP socket —
create, bulk add (build), upsert, search with R1-R7 request semantics
including the body-over-query override, document deletes/patch, the
ingress lifecycle, error mapping (400/404/503), and EXACT response
envelopes per handler:

    handlers/indexes.go:32       list    -> {"items": [...]}
    handlers/indexes.go:102      create  -> 201 + config
    handlers/indexes.go:194      update  -> 200 + config
    handlers/indexes.go:141-150  delete  -> 204, no body
    handlers/documents.go:200    add     -> 201 + {"indexed": n}
    handlers/documents.go:214    delete  -> ids[] wire form, 204
    handlers/ingresses.go:52     list    -> {"ingresses": [...]}
    handlers/ingresses.go:108    create  -> 201 + IngressInfo
    handlers/ingresses.go:157    update  -> {"state": ...} body
"""

import json
import os
import threading
import time
import urllib.error
import urllib.request

import pandas as pd
import pytest

from bright_spark.api.server import make_server
from bright_spark.index.store import IndexStore
from bright_spark.streaming.manager import IngressManager


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    data = str(tmp_path_factory.mktemp("api") / "data")
    store = IndexStore(spark, data)
    manager = IngressManager(spark, data)
    srv = make_server(store, 0, ingress_manager=manager)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, data
    srv.shutdown()


def call(base, method, path, body=None, expect=200):
    req = urllib.request.Request(
        base + path, method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            raw = r.read()
            return r.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, json.loads(raw) if raw else None


def test_full_api_flow(api):
    base, _ = api
    assert call(base, "GET", "/health") == (200, {"status": "ok"})

    # index lifecycle — create returns 201 + the config envelope
    st, body = call(base, "POST", "/indexes",
                    {"id": "docs", "tokenizer": "simple"})
    assert st == 201
    assert body == {"id": "docs", "primaryKey": None,
                    "excludeAttributes": []}
    st, body = call(base, "GET", "/indexes")
    assert st == 200 and body["items"][0]["id"] == "docs"
    st, _ = call(base, "POST", "/indexes", {"id": "docs"})
    assert st == 400  # duplicate
    st, _ = call(base, "GET", "/indexes/nope")
    assert st == 404

    # first batch builds (PK auto-detect: rid), later batch upserts;
    # envelope is 201 {"indexed": n} (documents.go:200-202)
    rows = [{"rid": i, "content": f"alpha beta doc{i}", "kind": f"k{i % 3}"}
            for i in range(12)]
    st, body = call(base, "POST", "/indexes/docs/documents", rows)
    assert (st, body) == (201, {"indexed": 12})
    st, body = call(base, "POST", "/indexes/docs/documents",
                    [{"rid": 100, "content": "gamma fresh row",
                      "kind": "k9"}])
    assert (st, body) == (201, {"indexed": 1})

    # search: query params + body override (R7) + envelope keys (R6)
    st, body = call(base, "POST", "/indexes/docs/searches?q=alpha&limit=2")
    assert st == 200 and body["totalHits"] == 12
    assert len(body["hits"]) == 2 and body["totalPages"] == 6
    assert all("_score" in h and "id" in h for h in body["hits"])
    st, body = call(base, "POST", "/indexes/docs/searches?q=alpha&limit=2",
                    {"q": "gamma", "limit": 5})  # body overrides
    assert st == 200 and body["totalHits"] == 1
    assert body["hits"][0]["doc_id"] == 100  # PK stored as doc_id

    # sort + pagination through the wire; a SCALAR sort param must act
    # as a one-element list, not iterate character-wise
    st, body = call(base, "POST",
                    "/indexes/docs/searches?q=alpha&limit=3&page=2"
                    "&sort[]=-doc_id")
    assert st == 200
    rids = [h["doc_id"] for h in body["hits"]]
    assert rids == [8, 7, 6]  # ids 11..0 desc, page 2 of 3
    st, body = call(base, "POST",
                    "/indexes/docs/searches?q=alpha&limit=3&sort=-doc_id")
    assert st == 200 and [h["doc_id"] for h in body["hits"]] == [11, 10, 9]

    # deep pagination: the wire caps the result window at 10k (the
    # reference's own wire-safety bound, documents.go:240) -> 400
    st, _ = call(base, "POST",
                 "/indexes/docs/searches?q=alpha&offset=99999&limit=10")
    assert st == 400

    # projections: retrieve vs exclude are mutually exclusive (400)
    st, body = call(base, "POST", "/indexes/docs/searches",
                    {"q": "alpha", "attributesToRetrieve": ["kind"],
                     "attributesToExclude": ["content"]})
    assert st == 400

    # document routes — 204s carry no body
    st, body = call(base, "DELETE", "/indexes/docs/documents/0")
    assert (st, body) == (204, None)
    # the reference's wire form is repeated ids[] params
    # (documents.go `query:"ids[]"`)
    st, _ = call(base, "DELETE",
                 "/indexes/docs/documents?ids[]=1&ids[]=2")
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
    # comma form still accepted as a convenience
    st, _ = call(base, "DELETE", "/indexes/docs/documents?ids=6,7")
    assert st == 204

    # update returns 200 + config; delete index is a bodyless 204
    st, body = call(base, "PATCH", "/indexes/docs", {"primaryKey": "rid"})
    assert st == 200 and body["primaryKey"] == "rid"
    st, body = call(base, "DELETE", "/indexes/docs")
    assert (st, body) == (204, None)
    st, _ = call(base, "POST", "/indexes/docs/searches?q=alpha")
    assert st == 404


def test_wire_edge_cases(api):
    """Review regressions pinned: numeric-looking terms stay strings,
    malformed numeric params are 400s (not 500s), and PATCH with an
    explicit empty excludeAttributes CLEARS the exclusions."""
    base, _ = api
    st, _ = call(base, "POST", "/indexes",
                 {"id": "edge", "tokenizer": "simple",
                  "excludeAttributes": ["secret"]})
    assert st == 201
    st, body = call(base, "POST", "/indexes/edge/documents?contentCol=text",
                    [{"rid": 1, "text": "code 123 here", "secret": "x"}])
    assert st == 201
    # ?q=123 searches the TERM '123' (int coercion must not touch q)
    st, body = call(base, "POST", "/indexes/edge/searches?q=123")
    assert st == 200 and body["totalHits"] == 1
    # malformed numerics -> 400, not a 500 TypeError
    st, _ = call(base, "POST", "/indexes/edge/searches?q=code&limit=abc")
    assert st == 400
    st, _ = call(base, "POST", "/indexes/edge/searches",
                 {"q": "code", "limit": "abc"})
    assert st == 400
    # a non-list body value for a list param -> 400, not a crash
    st, _ = call(base, "POST", "/indexes/edge/searches",
                 {"q": "code", "sort": 5})
    assert st == 400
    # PATCH with explicit [] clears exclusions (falsy is not absent)
    st, _ = call(base, "PATCH", "/indexes/edge", {"excludeAttributes": []})
    assert st == 200
    st, body = call(base, "GET", "/indexes/edge")
    assert body["excludeAttributes"] == []
    call(base, "DELETE", "/indexes/edge")


SCHEMA = "rid BIGINT, text STRING, kind STRING, _deleted BOOLEAN"


def _drop_batch(spark, feed, name, rows):
    import glob
    import shutil
    tmp = os.path.join(feed, f".tmp_{name}")
    df = spark.createDataFrame(pd.DataFrame(rows), SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.rename(part, os.path.join(feed, f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def test_ingress_routes_lifecycle(api, spark, tmp_path_factory):
    """The reference's five ingress routes (main.go:246-251,
    handlers/ingresses.go) through the wire: create auto-starts,
    GET/list report IngressInfo, PATCH {"state": ...} maps to
    resync/pause/resume, DELETE stops and removes, and the data
    actually flows into the index."""
    base, _ = api
    feed = str(tmp_path_factory.mktemp("wirefeed"))
    st, _ = call(base, "POST", "/indexes",
                 {"id": "syncd", "tokenizer": "simple"})
    assert st == 201
    st, _ = call(base, "POST", "/indexes/syncd/documents?contentCol=text",
                 [{"rid": i, "text": f"seed alpha {i}", "kind": "k"}
                  for i in range(5)])
    assert st == 201

    # index must exist (404), body must carry id+type (400)
    st, _ = call(base, "GET", "/indexes/nope/ingresses")
    assert st == 404
    st, _ = call(base, "POST", "/indexes/syncd/ingresses", {"id": "f1"})
    assert st == 400
    st, _ = call(base, "POST", "/indexes/syncd/ingresses",
                 {"id": "f1", "type": "postgres"})
    assert st == 400  # only the filedrop CDC analog exists here

    st, info = call(base, "POST", "/indexes/syncd/ingresses",
                    {"id": "f1", "type": "filedrop",
                     "config": {"source_dir": feed, "schema_ddl": SCHEMA,
                                "interval_s": 0.3}})
    assert st == 201
    assert info["id"] == "f1" and info["index_id"] == "syncd"
    # the auto-started loop may already be mid-first-pass
    assert info["type"] == "filedrop"
    assert info["status"] in ("running", "syncing")
    assert "statistics" in info  # ingress.go:76-94 IngressInfo shape

    st, body = call(base, "GET", "/indexes/syncd/ingresses")
    assert st == 200 and [i["id"] for i in body["ingresses"]] == ["f1"]

    # drop a batch; the running poll loop applies it
    _drop_batch(spark, feed, "b1",
                [{"rid": 100, "text": "wire synced gammaX", "kind": "k",
                  "_deleted": None}])
    deadline = time.time() + 60
    while time.time() < deadline:
        st, body = call(base, "POST", "/indexes/syncd/searches?q=gammax")
        if st == 200 and body["totalHits"] == 1:
            break
        time.sleep(0.5)
    assert body["totalHits"] == 1

    # PATCH state machine: pause -> resume -> resync; bad state -> 400
    st, info = call(base, "PATCH", "/indexes/syncd/ingresses/f1",
                    {"state": "paused"})
    assert st == 200 and info["status"] == "paused"
    st, info = call(base, "PATCH", "/indexes/syncd/ingresses/f1",
                    {"state": "running"})
    assert st == 200 and info["status"] == "running"
    st, info = call(base, "PATCH", "/indexes/syncd/ingresses/f1",
                    {"state": "resyncing"})
    assert st == 200
    assert info["statistics"]["documents_synced"] >= 2  # re-ingested
    st, _ = call(base, "PATCH", "/indexes/syncd/ingresses/f1",
                 {"state": "warp"})
    assert st == 400
    st, _ = call(base, "PATCH", "/indexes/syncd/ingresses/missing",
                 {"state": "paused"})
    assert st == 404

    st, body = call(base, "DELETE", "/indexes/syncd/ingresses/f1")
    assert (st, body) == (204, None)
    st, body = call(base, "GET", "/indexes/syncd/ingresses")
    assert body["ingresses"] == []
    call(base, "DELETE", "/indexes/syncd")


def test_ingress_routes_503_without_manager(spark, tmp_path_factory):
    """A server constructed without an IngressManager returns 503 on
    the ingress routes (handlers/ingresses.go:30-34), not 404."""
    store = IndexStore(spark, str(tmp_path_factory.mktemp("nomg") / "d"))
    srv = make_server(store, 0)  # no manager
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        st, body = call(base, "GET", "/indexes/any/ingresses")
        assert st == 503 and "ingress manager" in body["error"]
    finally:
        srv.shutdown()


def test_concurrent_wire_requests(api):
    """The reference is served by Fiber (goroutine per request) over a
    lock-guarded store; our analog is ThreadingHTTPServer over the
    locked IndexStore. Drive the real wire concurrently: parallel
    creates of distinct ids, parallel document batches into ONE index,
    and searches racing the writes — every response well-formed, every
    row landing exactly once."""
    base, _ = api
    errs = []

    def create(i):
        try:
            st, _ = call(base, "POST", "/indexes",
                         {"id": f"cw{i}", "tokenizer": "simple"})
            assert st == 201, st
        except Exception as e:
            errs.append(repr(e))

    threads = [threading.Thread(target=create, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errs and not [t for t in threads if t.is_alive()]
    st, body = call(base, "GET", "/indexes?limit=100")
    listed = {it["id"] for it in body["items"]}
    assert {f"cw{i}" for i in range(6)} <= listed

    # first batch builds (serialized by the store's index lock even
    # though three arrive at once), later batches upsert
    def add(lo):
        try:
            st, body = call(base, "POST", "/indexes/cw0/documents",
                            [{"rid": i, "content": f"widget {i} alpha"}
                             for i in range(lo, lo + 10)])
            assert st == 201 and body == {"indexed": 10}, (st, body)
        except Exception as e:
            errs.append(repr(e))

    def probe():
        try:
            for _ in range(10):
                st, body = call(base, "POST",
                                "/indexes/cw0/searches?q=alpha&limit=1")
                assert st == 200 and "totalHits" in body, (st, body)
        except Exception as e:
            errs.append(repr(e))

    threads = ([threading.Thread(target=add, args=(lo,))
                for lo in (0, 100, 200)]
               + [threading.Thread(target=probe)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errs and not [t for t in threads if t.is_alive()]
    st, body = call(base, "POST", "/indexes/cw0/searches?q=alpha&limit=1")
    assert st == 200 and body["totalHits"] == 30
    for i in range(6):
        call(base, "DELETE", f"/indexes/cw{i}")
