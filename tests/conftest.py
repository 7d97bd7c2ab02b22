"""Shared fixtures: the reference's KG_LOOP / KG_CHAIN test graphs
(tests/test_walkers_samplers.py:26-49 in /root/reference) rebuilt as
triples DataFrames, plus a session-scoped local SparkSession."""

import pytest

from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.session import get_spark

URL = "http://pyRDF2Vec"

LOOP = [
    ("Alice", "knows", "Bob"),
    ("Alice", "knows", "Dean"),
    ("Bob", "knows", "Dean"),
    ("Dean", "loves", "Alice"),
]

CHAIN = [
    ("Alice", "knows", "Bob"),
    ("Alice", "knows", "Dean"),
    ("Bob", "knows", "Mathilde"),
    ("Mathilde", "knows", "Alfy"),
    ("Alfy", "knows", "Stephane"),
    ("Stephane", "knows", "Alfred"),
    ("Alfred", "knows", "Emma"),
    ("Emma", "knows", "Julio"),
]

GRAPH3 = [  # tests/test_graph.py:33-41 literals fixture
    ("Alice", "knows", "Bob"),
    ("Alice", "knows", "Dean"),
    ("Bob", "knows", "Casper"),
]

ROOTS = [f"{URL}#{e}" for e in ("Alice", "Bob", "Dean")]


def uri(name: str) -> str:
    return f"{URL}#{name}"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _triples_df(spark, rows):
    return spark.createDataFrame(
        [(uri(s), uri(p), uri(o)) for s, p, o in rows],
        "subj string, pred string, obj string",
    )


@pytest.fixture(scope="session")
def kg_loop(spark):
    return SparkKG(_triples_df(spark, LOOP))


@pytest.fixture(scope="session")
def kg_chain(spark):
    return SparkKG(_triples_df(spark, CHAIN))


@pytest.fixture(scope="session")
def kg_graph3(spark):
    return SparkKG(_triples_df(spark, GRAPH3), literals=[[uri("knows")]])


@pytest.fixture(scope="session")
def roots(spark):
    return spark.createDataFrame([(r,) for r in ROOTS], "name string")
