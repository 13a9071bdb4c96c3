"""REST surface over :class:`IndexStore` — the reference's Fiber API
re-expressed with the stdlib HTTP server (main.go:216-252 routes,
handlers/{indexes,documents,search}.go semantics):

    GET    /health
    GET    /indexes                     list (limit/offset)
    POST   /indexes                     create {id, primaryKey,
                                        excludeAttributes[]}
    GET    /indexes/:id                 config
    PATCH  /indexes/:id                 update config
    DELETE /indexes/:id
    POST   /indexes/:id/documents       JSON array of docs (first batch
                                        builds, later batches upsert);
                                        ?contentCol= names the analyzed
                                        column (default 'content')
    DELETE /indexes/:id/documents       ?ids=1,2 or ?filter=<query>
    DELETE /indexes/:id/documents/:docid
    PATCH  /indexes/:id/documents/:docid  merge-fields partial update
    POST   /indexes/:id/searches        query params + JSON body with
                                        body-over-query override (R7,
                                        handlers/search.go:39-63)

Error mapping mirrors the reference: request errors -> 400, missing
index/document -> 404 (errors/ package semantics). Clustering, auth,
and metrics middleware stay excluded per SURVEY §2.9's disposition.

Driver-friendly: one Spark session serves all requests; the server is
a thin marshalling layer — every operation is the same IndexStore call
the library user makes, so wire semantics and library semantics cannot
drift apart.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from bright_spark.index.store import IndexStore
from bright_spark.models import IndexConfig, SearchRequest, SearchRequestError
from bright_spark.query.planner import TooManyClausesError


_NUMERIC_PARAMS = {"limit", "offset", "page"}


def _qs_params(query: str) -> dict:
    """Query-string params in the reference's wire shape (repeated
    keys / `[]` suffix become lists). ONLY the known-numeric keys are
    int-coerced — `?q=123` must stay the string term '123', never an
    int that crashes the parser."""
    out: dict = {}
    for k, vals in parse_qs(query).items():
        if k.endswith("[]") or len(vals) > 1:
            out[k] = vals
        else:
            v = vals[0]
            if k in _NUMERIC_PARAMS:
                if not v.lstrip("-").isdigit():
                    raise SearchRequestError(f"{k} must be an integer")
                out[k] = int(v)
            else:
                out[k] = v
    return out


def make_handler(store: IndexStore):
    # one lock around store mutations: the reference serializes writes
    # per index via RW locks (store.go:18-25); a coarse lock is the
    # single-writer contract the snapshot layer assumes
    write_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet test output
            pass

        # ----------------------------------------------------- plumbing

        def _json(self, code: int, payload) -> None:
            if code == 204:  # RFC 9110: No Content carries no body
                self.send_response(code)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length") or 0)
            if not n:
                return None
            return json.loads(self.rfile.read(n))

        def _route(self):
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            return parts, _qs_params(u.query)

        def _dispatch(self, method: str) -> None:
            try:
                parts, params = self._route()
                handler = self._find(method, parts)
                if handler is None:
                    return self._json(404, {"error": "not found"})
                handler(parts, params)
            except (SearchRequestError, TooManyClausesError, ValueError) as e:
                self._json(400, {"error": str(e)})
            except KeyError as e:
                self._json(404, {"error": str(e)})
            except Exception as e:  # 500 with the message, like Fiber
                self._json(500, {"error": str(e)})

        def _find(self, method: str, parts: list[str]):
            if method == "GET" and parts == ["health"]:
                return lambda p, q: self._json(200, {"status": "ok"})
            if not parts or parts[0] != "indexes":
                return None
            n = len(parts)
            table = {
                ("GET", 1): self.list_indexes,
                ("POST", 1): self.create_index,
                ("GET", 2): self.get_index,
                ("PATCH", 2): self.update_index,
                ("DELETE", 2): self.delete_index,
            }
            if n == 3 and parts[2] == "documents":
                table[("POST", 3)] = self.add_documents
                table[("DELETE", 3)] = self.delete_documents
            if n == 3 and parts[2] == "searches":
                table[("POST", 3)] = self.search
            if n == 4 and parts[2] == "documents":
                table[("DELETE", 4)] = self.delete_document
                table[("PATCH", 4)] = self.update_document
            return table.get((method, n))

        # ------------------------------------------------------- routes

        def list_indexes(self, parts, params) -> None:
            cfgs = store.list_indexes(limit=params.get("limit", 20),
                                      offset=params.get("offset", 0))
            self._json(200, [{"id": c.id, "primaryKey": c.primary_key,
                              "excludeAttributes": list(c.exclude_attributes)}
                             for c in cfgs])

        def create_index(self, parts, params) -> None:
            b = self._body() or {}
            if not b.get("id"):
                raise ValueError("id is required")
            with write_lock:
                store.create_index(IndexConfig(
                    id=b["id"], primary_key=b.get("primaryKey"),
                    exclude_attributes=tuple(b.get("excludeAttributes")
                                             or ()),
                    tokenizer=b.get("tokenizer", "code")))
            self._json(201, {"id": b["id"]})

        def get_index(self, parts, params) -> None:
            _, cfg = store.get_index(parts[1])
            self._json(200, {"id": cfg.id, "primaryKey": cfg.primary_key,
                             "excludeAttributes":
                                 list(cfg.exclude_attributes)})

        def update_index(self, parts, params) -> None:
            b = self._body() or {}
            _, cur = store.get_index(parts[1])
            import dataclasses
            with write_lock:
                # explicit presence checks: {"excludeAttributes": []}
                # must CLEAR the exclusions, and {"primaryKey": null}
                # must null the key — a falsy value is not "absent"
                store.update_index(parts[1], dataclasses.replace(
                    cur,
                    primary_key=(b["primaryKey"] if "primaryKey" in b
                                 else cur.primary_key),
                    exclude_attributes=tuple(
                        b["excludeAttributes"]
                        if "excludeAttributes" in b
                        else cur.exclude_attributes)))
            self._json(200, {"id": parts[1]})

        def delete_index(self, parts, params) -> None:
            with write_lock:
                store.delete_index(parts[1])
            self._json(204, {})

        def add_documents(self, parts, params) -> None:
            docs = self._body()
            if not isinstance(docs, list) or not docs:
                raise ValueError("body must be a non-empty JSON array")
            df = store.spark.createDataFrame(docs)
            kwargs = {}
            if "contentCol" in params:
                kwargs["content_col"] = params["contentCol"]
            with write_lock:
                store.add_documents(parts[1], df, **kwargs)
            self._json(202, {"received": len(docs)})

        def delete_documents(self, parts, params) -> None:
            ids = params.get("ids")
            if isinstance(ids, (int, str)):
                ids = [int(x) for x in str(ids).split(",") if x]
            with write_lock:
                store.delete_documents(parts[1], ids=ids,
                                       filter_query=params.get("filter"))
            self._json(204, {})

        def delete_document(self, parts, params) -> None:
            with write_lock:
                store.delete_document(parts[1], int(parts[3]))
            self._json(204, {})

        def update_document(self, parts, params) -> None:
            fields = self._body() or {}
            with write_lock:
                rec = store.update_document(parts[1], int(parts[3]), fields)
            self._json(200, {k: v for k, v in rec.items()
                             if k != "content_sha256"})

        def search(self, parts, params) -> None:
            req = SearchRequest.from_params(params, self._body())
            resp = store.search(parts[1], req)
            self._json(200, resp.to_dict())

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_PATCH(self):
            self._dispatch("PATCH")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


def make_server(store: IndexStore, port: int = 0) -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral) and return the server; the caller
    drives serve_forever (jobs/serve.py does, tests run it in a
    thread)."""
    return ThreadingHTTPServer(("127.0.0.1", port), make_handler(store))
