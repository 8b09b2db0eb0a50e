"""Wire-format coverage for HTTPReconcileBackend: a loopback HTTP server
speaks the OpenRefine batch reconciliation protocol (reference
reconcile.py:23-43), asserting the exact request shape and exercising
response parsing and the error path — no external network involved."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs

import pytest

pytest.importorskip("requests")

from rdf_mapper_ray.engine.reconcile import HTTPReconcileBackend, pick_match

RECEIVED: list[dict] = []


class _Handler(BaseHTTPRequestHandler):
    status = 200

    def do_POST(self):
        length = int(self.headers["Content-Length"])
        body = self.rfile.read(length).decode()
        form = parse_qs(body)
        queries = json.loads(form["queries"][0])
        RECEIVED.append(queries)
        if _Handler.status != 200:
            self.send_response(_Handler.status)
            self.end_headers()
            return
        out = {}
        for key, q in queries.items():
            name = q["query"]
            if name == "acme":
                out[key] = {"result": [{"id": "http://kb/acme",
                                        "name": "ACME", "score": 99,
                                        "match": True,
                                        "type": q.get("type")}]}
            elif name == "ambiguous":
                out[key] = {"result": [
                    {"id": "http://kb/a1", "name": "A1", "score": 50,
                     "match": False},
                    {"id": "http://kb/a2", "name": "A2", "score": 48,
                     "match": False}]}
            else:
                out[key] = {"result": []}
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):      # silence test output
        pass


@pytest.fixture()
def recon_server():
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    RECEIVED.clear()
    _Handler.status = 200
    yield f"http://127.0.0.1:{server.server_address[1]}/reconcile"
    server.shutdown()
    thread.join(timeout=5)


def test_http_backend_batch_protocol(recon_server):
    backend = HTTPReconcileBackend()
    results = backend.query(recon_server, [
        {"query": "acme", "type": "Company",
         "filters": [("P17", "US")]},
        {"query": "ambiguous"},
        {"query": "nothing"},
    ])
    # request wire format: numbered batch keys, type + properties mapping
    assert len(RECEIVED) == 1
    batch = RECEIVED[0]
    assert set(batch) == {"0", "1", "2"}
    assert batch["0"] == {"query": "acme", "type": "Company",
                          "properties": [{"pid": "P17", "v": "US"}]}
    assert batch["1"] == {"query": "ambiguous"}
    # response parsing keeps request order
    assert pick_match(results[0]["result"])["id"] == "http://kb/acme"
    assert pick_match(results[1]["result"]) is None      # two candidates
    assert len(results[1]["result"]) == 2
    assert results[2]["result"] == []


def test_http_backend_error_status(recon_server):
    _Handler.status = 503
    backend = HTTPReconcileBackend()
    with pytest.raises(ValueError, match="503"):
        backend.query(recon_server, [{"query": "acme"}])


def test_http_backend_in_mention_pipeline(recon_server, ray_session):
    """End-to-end: the HTTP backend drives the two-phase mention flow
    exactly like the in-memory one."""
    import ray.data
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    spec = {
        "globals": {"$datasetID": "t",
                    "$reconciliationAPI": recon_server},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "org", "properties": {
            "@id": "<http://e/org/{id}>",
            "<ex:sameAs>": "{name | reconcile('Company')}",
        }}],
    }
    pipe = KGPipeline(spec, auto_declare=False, canonicalize=False,
                      reconcile_backend=HTTPReconcileBackend(),
                      reconcile_mode="mentions")
    ds = ray.data.from_items([{"id": "1", "name": "acme"}])
    out = pipe.run(ds).to_pandas()
    hit = out[out["predicate"] == "http://e/sameAs"]
    assert hit["object_value"].tolist() == ["http://kb/acme"]
