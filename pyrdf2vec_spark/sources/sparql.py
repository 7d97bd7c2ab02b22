"""Remote-KG ingest shim (SURVEY.md S2/S3 — the reference's
``KG("https://dbpedia.org/sparql", ...)`` mode, connectors.py:36-154).

The reference fetches hops per vertex over HTTP, entity by entity, with
a TTL cache and asyncio bundling. The Spark-shaped equivalent is BULK:
export (or page) the endpoint's triples once into DataFrames, then every
per-vertex lookup becomes the adjacency join SparkKG already does. Three
entry points:

- ``get_query`` / ``get_hops_query`` — query-string builders with exact
  reference parity (connectors.py:136-154), so a user can reproduce the
  reference's requests verbatim.
- ``triples_from_sparql_json(spark, path)`` — parse standard SPARQL
  results files (``application/sparql-results+json``, the export format
  every endpoint and `CONSTRUCT`/`SELECT ?s ?p ?o` dump produces) into a
  triples DataFrame: per-file ``mapInPandas``, same shape as rdf.py.
- ``fetch_triples(spark, endpoint, entities)`` — live bulk fetch: the
  entity list is partitioned across executors and each partition issues
  its batch of per-entity hop queries (urllib, stdlib-only) — the
  reference's asyncio.gather bundling replaced by partition parallelism.
  Tested against a local in-process HTTP server; NO external service is
  contacted unless the caller passes one.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

HOPS_SCHEMA = "subj string, pred string, obj string"


def get_query(entity: str, preds: list[str] | None = None) -> str:
    """Reference-exact SPARQL builder (connectors.py:136-154): hop query
    ``SELECT ?p ?o WHERE { <e> ?p ?o . }`` or the literal-chain form when
    ``preds`` is given."""
    query = f"SELECT ?p ?o WHERE {{ <{entity}> ?p "
    if preds:
        query = f"SELECT ?o WHERE {{ <{entity}> <{preds[0]}> "
        for i in range(1, len(preds)):
            query += f"?o{i} . ?o{i} <{preds[i]}> "
    query += "?o . }"
    return query


def get_hops_query(entity: str, is_reverse: bool = False) -> str:
    """Forward or reverse hop query (kg.py:455-467 remote branch)."""
    if is_reverse:
        return f"SELECT ?p ?o WHERE {{ ?o ?p <{entity}> . }}"
    return get_query(entity)


def _rows_from_results(doc: dict, subj: str | None = None):
    """Standard SPARQL JSON results → (subj, pred, obj) rows. Accepts
    both ?s ?p ?o selections (dump files) and ?p ?o hop responses
    (subject supplied by the caller)."""
    out = []
    for b in doc.get("results", {}).get("bindings", []):
        s = b.get("s", {}).get("value", subj)
        p = b.get("p", {}).get("value")
        o = b.get("o", {}).get("value")
        if s is not None and p is not None and o is not None:
            out.append((s, p, o))
    return out


def triples_from_sparql_json(spark: SparkSession, path: str) -> DataFrame:
    """Triples from SPARQL-results JSON file(s) — one task per file,
    Arrow-batched, mirroring sources.rdf.triples_from_rdf."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["content"]:
                rows.extend(_rows_from_results(json.loads(bytes(raw))))
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj"])

    return files.mapInPandas(gen, HOPS_SCHEMA)


def fetch_triples(
    spark: SparkSession,
    endpoint: str,
    entities: DataFrame,
    is_reverse: bool = False,
    timeout: float = 30.0,
) -> DataFrame:
    """Bulk hop fetch: one HTTP request per entity, issued from the
    executors (entity rows partition across the cluster — the Spark
    analogue of the reference's asyncio bundling, connectors.py:89-119).
    Request shape is the reference's: GET {endpoint}/query?query=...
    with an Accept: sparql-results+json header."""
    ents = entities.select(entities.columns[0])
    rev = is_reverse
    ep = endpoint.rstrip("/")
    tmo = timeout

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        headers = {"Accept": "application/sparql-results+json"}
        for pdf in batches:
            rows = []
            for entity in pdf.iloc[:, 0]:
                q = urllib.parse.quote(get_hops_query(entity, rev))
                req = urllib.request.Request(
                    f"{ep}/query?query={q}", headers=headers
                )
                with urllib.request.urlopen(req, timeout=tmo) as res:
                    doc = json.loads(res.read())
                if rev:
                    # bindings are (?p, ?o=parent): subject is the parent
                    rows.extend(
                        (o, p, entity)
                        for _, p, o in _rows_from_results(doc, entity)
                    )
                else:
                    rows.extend(_rows_from_results(doc, entity))
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj"])

    return ents.mapInPandas(gen, HOPS_SCHEMA)
