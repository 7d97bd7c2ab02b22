"""Remote-KG ingest shim: query-string parity with the reference
connector (connectors.py:136-154), SPARQL-results JSON file ingest, and
a LIVE bulk fetch against a local in-process HTTP endpoint (no external
network)."""

import http.server
import json
import threading
import urllib.parse

import pytest

from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.sources.sparql import (
    fetch_triples,
    get_hops_query,
    get_query,
    triples_from_sparql_json,
)

TRIPLES = [
    ("http://e/a", "http://e/knows", "http://e/b"),
    ("http://e/b", "http://e/knows", "http://e/c"),
    ("http://e/c", "http://e/likes", "http://e/a"),
]


def _bindings(rows, with_subj):
    out = []
    for s, p, o in rows:
        b = {"p": {"type": "uri", "value": p}, "o": {"type": "uri", "value": o}}
        if with_subj:
            b["s"] = {"type": "uri", "value": s}
        out.append(b)
    return out


class TestQueryParity:
    def test_hop_query(self):
        # connectors.py:147-154 output, byte for byte
        assert (
            get_query("http://e/a")
            == "SELECT ?p ?o WHERE { <http://e/a> ?p ?o . }"
        )

    def test_literal_chain_query(self):
        assert get_query("http://e/a", ["p1", "p2", "p3"]) == (
            "SELECT ?o WHERE { <http://e/a> <p1> "
            "?o1 . ?o1 <p2> ?o2 . ?o2 <p3> ?o . }"
        )

    def test_reverse_query(self):
        assert (
            get_hops_query("http://e/a", is_reverse=True)
            == "SELECT ?p ?o WHERE { ?o ?p <http://e/a> . }"
        )


class TestJsonIngest:
    def test_dump_file(self, spark, tmp_path):
        doc = {
            "head": {"vars": ["s", "p", "o"]},
            "results": {"bindings": _bindings(TRIPLES, True)},
        }
        p = tmp_path / "dump.json"
        p.write_text(json.dumps(doc))
        df = triples_from_sparql_json(spark, str(p))
        assert {tuple(r) for r in df.collect()} == set(TRIPLES)


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        query = urllib.parse.parse_qs(parsed.query)["query"][0]
        # extract the entity between <...> and serve its hops
        if query.startswith("SELECT ?p ?o WHERE { ?o ?p <"):
            ent = query.split("<")[1].split(">")[0]
            rows = [(s, p, o) for s, p, o in TRIPLES if o == ent]
            # reverse responses bind ?o to the PARENT
            bindings = [
                {
                    "p": {"value": p},
                    "o": {"value": s},
                }
                for s, p, o in rows
            ]
        else:
            ent = query.split("<")[1].split(">")[0]
            rows = [(s, p, o) for s, p, o in TRIPLES if s == ent]
            bindings = _bindings(rows, False)
        body = json.dumps(
            {"results": {"bindings": bindings}}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def endpoint():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestLiveFetch:
    def test_bulk_forward_fetch_builds_kg(self, spark, endpoint):
        ents = spark.createDataFrame(
            [("http://e/a",), ("http://e/b",), ("http://e/c",)],
            "name string",
        )
        # subjects resolve via ?p ?o hop queries issued from executors
        df = fetch_triples(spark, endpoint, ents)
        got = {tuple(r) for r in df.collect()}
        assert got == set(TRIPLES)
        kg = SparkKG(df)
        assert kg.edge_count() == 3

    def test_bulk_reverse_fetch(self, spark, endpoint):
        ents = spark.createDataFrame([("http://e/b",)], "name string")
        df = fetch_triples(spark, endpoint, ents, is_reverse=True)
        assert {tuple(r) for r in df.collect()} == {
            ("http://e/a", "http://e/knows", "http://e/b")
        }
