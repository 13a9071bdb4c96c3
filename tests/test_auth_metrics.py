"""Master-key auth + metrics middleware parity
(middlewares/authorization.go:14-67, main.go:210-219):

- no configured key -> authentication disabled, everything open;
- configured key -> every route below /health and /metrics requires
  ``Authorization: Bearer <key>`` and 401s with the reference's exact
  error envelopes otherwise;
- /metrics serves a Prometheus-text request counter without auth
  (main.go:210 registers metrics BEFORE the auth middleware), with
  Fiber-style route-pattern labels so cardinality stays bounded.

Also covers the ingress route scoping fix: an ingress must only be
addressable through ITS index's URL (ADVICE r4)."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from bright_spark.api.server import make_server
from bright_spark.index.store import IndexStore
from bright_spark.streaming.manager import IngressManager


def call(base, method, path, body=None, headers=None):
    hdrs = {"Content-Type": "application/json"}
    hdrs.update(headers or {})
    req = urllib.request.Request(
        base + path, method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers=hdrs)
    try:
        with urllib.request.urlopen(req) as r:
            raw = r.read()
            ctype = r.headers.get("Content-Type", "")
            if ctype.startswith("text/plain"):
                return r.status, raw.decode()
            return r.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, json.loads(raw) if raw else None


@pytest.fixture(scope="module")
def auth_api(spark, tmp_path_factory):
    data = str(tmp_path_factory.mktemp("auth_api") / "data")
    store = IndexStore(spark, data)
    srv = make_server(store, 0, master_key="sesame")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_health_and_metrics_exempt_from_auth(auth_api):
    st, body = call(auth_api, "GET", "/health")
    assert (st, body) == (200, {"status": "ok"})
    st, text = call(auth_api, "GET", "/metrics")
    assert st == 200
    assert "bright_spark_http_requests_total" in text


def test_auth_error_envelopes(auth_api):
    # the reference's three distinct 401 envelopes, verbatim
    # (authorization.go:22-58)
    st, body = call(auth_api, "GET", "/indexes")
    assert st == 401
    assert body == {"error": "missing authorization header"}

    st, body = call(auth_api, "GET", "/indexes",
                    headers={"Authorization": "sesame"})
    assert st == 401
    assert body == {"error": "invalid authorization format, expected "
                             "'Bearer <token>'"}

    st, body = call(auth_api, "GET", "/indexes",
                    headers={"Authorization": "Basic sesame"})
    assert st == 401
    assert body == {"error": "invalid authorization format, expected "
                             "'Bearer <token>'"}

    st, body = call(auth_api, "GET", "/indexes",
                    headers={"Authorization": "Bearer wrong"})
    assert st == 401
    assert body == {"error": "invalid authorization token"}


def test_auth_accepts_valid_bearer_on_every_method(auth_api):
    ok = {"Authorization": "Bearer sesame"}
    st, body = call(auth_api, "GET", "/indexes", headers=ok)
    assert st == 200 and body == {"items": []}
    st, _ = call(auth_api, "POST", "/indexes",
                 {"id": "guarded", "tokenizer": "simple"}, headers=ok)
    assert st == 201
    # write routes are guarded too
    st, _ = call(auth_api, "DELETE", "/indexes/guarded")
    assert st == 401
    st, _ = call(auth_api, "DELETE", "/indexes/guarded", headers=ok)
    assert st == 204


def test_metrics_counts_requests_with_route_patterns(auth_api):
    ok = {"Authorization": "Bearer sesame"}
    call(auth_api, "GET", "/indexes", headers=ok)
    call(auth_api, "GET", "/indexes/nope", headers=ok)  # 404
    call(auth_api, "GET", "/indexes")                   # 401
    st, text = call(auth_api, "GET", "/metrics")
    assert st == 200
    assert "# TYPE bright_spark_http_requests_total counter" in text
    # ids collapse to :id — no per-id label blowup
    assert 'route="/indexes/:id"' in text and "nope" not in text
    counts = {}
    for line in text.splitlines():
        if line.startswith("bright_spark_http_requests_total"):
            label, n = line.rsplit(" ", 1)
            counts[label] = int(n)
    assert counts['bright_spark_http_requests_total{method="GET"'
                  ',route="/indexes/:id",status="404"}'] >= 1
    assert counts['bright_spark_http_requests_total{method="GET"'
                  ',route="/indexes",status="401"}'] >= 1


def test_no_master_key_leaves_api_open(spark, tmp_path_factory):
    data = str(tmp_path_factory.mktemp("open_api") / "data")
    srv = make_server(IndexStore(spark, data), 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        st, body = call(base, "GET", "/indexes")
        assert st == 200 and body == {"items": []}
    finally:
        srv.shutdown()


SCHEMA = "rid BIGINT, text STRING, kind STRING, _deleted BOOLEAN"


def test_ingress_routes_are_index_scoped(spark, tmp_path_factory):
    """/indexes/<iid>/ingresses/<gid> must 404 when <iid> is missing or
    when the ingress belongs to a DIFFERENT index (ADVICE r4: the old
    lookup keyed on the ingress id alone)."""
    data = str(tmp_path_factory.mktemp("scoped_api") / "data")
    store = IndexStore(spark, data)
    manager = IngressManager(spark, data)
    srv = make_server(store, 0, ingress_manager=manager)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    feed = str(tmp_path_factory.mktemp("scoped_feed"))
    try:
        for iid in ("owner", "other"):
            st, _ = call(base, "POST", "/indexes",
                         {"id": iid, "tokenizer": "simple"})
            assert st == 201
            st, _ = call(base, "POST",
                         f"/indexes/{iid}/documents?contentCol=text",
                         [{"rid": 1, "text": "seed alpha", "kind": "k"}])
            assert st == 201
        st, _ = call(base, "POST", "/indexes/owner/ingresses",
                     {"id": "g1", "type": "filedrop",
                      "config": {"source_dir": feed, "schema_ddl": SCHEMA,
                                 "interval_s": 5}})
        assert st == 201

        st, info = call(base, "GET", "/indexes/owner/ingresses/g1")
        assert st == 200 and info["index_id"] == "owner"
        # wrong index / missing index -> 404 on all three verbs
        for method, body in (("GET", None), ("DELETE", None),
                             ("PATCH", {"state": "paused"})):
            st, _ = call(base, method, "/indexes/other/ingresses/g1", body)
            assert st == 404, (method, st)
            st, _ = call(base, method, "/indexes/missing/ingresses/g1", body)
            assert st == 404, (method, st)
        # the correctly-scoped path still works end-to-end
        st, info = call(base, "PATCH", "/indexes/owner/ingresses/g1",
                        {"state": "paused"})
        assert st == 200 and info["status"] == "paused"
        st, _ = call(base, "DELETE", "/indexes/owner/ingresses/g1")
        assert st == 204
    finally:
        srv.shutdown()
