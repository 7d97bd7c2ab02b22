"""Graph-operator parity with /root/reference/tests/test_graph.py
(adjacency goldens, pliterals, literal casting, remove_edge) plus
existence gate and N-Triples scan."""

import math

from pyspark.sql import functions as F

from pyrdf2vec_spark.graph import SparkKG, triples_from_nt
from tests.conftest import URL, uri


class TestHops:
    def test_get_hops_children(self, kg_graph3):
        # reference tests/test_graph.py:121-133
        hops = kg_graph3.get_hops(uri("Alice")).collect()
        assert len(hops) == 2
        assert {h["pred"] for h in hops} == {uri("knows")}
        assert {h["obj"] for h in hops} == {uri("Bob"), uri("Dean")}

    def test_get_hops_reverse(self, kg_graph3):
        hops = kg_graph3.get_hops(uri("Bob"), is_reverse=True).collect()
        assert len(hops) == 1
        assert hops[0]["obj"] == uri("Alice")

    def test_get_neighbors(self, kg_graph3):
        names = {
            r["name"] for r in kg_graph3.get_neighbors(uri("Alice")).collect()
        }
        assert names == {uri("Bob"), uri("Dean")}

    def test_duplicate_triples_collapse(self, spark):
        dup = spark.createDataFrame(
            [("a", "p", "b")] * 3, "subj string, pred string, obj string"
        )
        assert SparkKG(dup).edges.count() == 1

    def test_bulk_hops_equals_single(self, kg_loop, spark):
        frontier = spark.createDataFrame([(uri("Alice"),)], "node string")
        bulk = {
            (r["pred"], r["other"])
            for r in kg_loop.hops(frontier, "node").collect()
        }
        single = {
            (r["pred"], r["obj"])
            for r in kg_loop.get_hops(uri("Alice")).collect()
        }
        assert bulk == single


class TestVertices:
    def test_classification(self, kg_loop):
        v = kg_loop.vertices().collect()
        ents = {r["name"] for r in v if not r["is_predicate"]}
        preds = {r["name"] for r in v if r["is_predicate"]}
        assert ents == {uri(e) for e in ("Alice", "Bob", "Dean")}
        assert preds == {uri("knows"), uri("loves")}


class TestExistence:
    def test_is_exist(self, kg_loop, roots):
        assert kg_loop.is_exist(roots)

    def test_missing(self, kg_loop, spark):
        ents = spark.createDataFrame(
            [(uri("Alice"),), (uri("Nobody"),)], "name string"
        )
        assert not kg_loop.is_exist(ents)
        missing = kg_loop.missing_entities(ents).collect()
        assert [r["name"] for r in missing] == [uri("Nobody")]


class TestLiterals:
    def test_pliterals(self, kg_graph3, spark):
        # reference tests/test_graph.py:98-119
        ents = spark.createDataFrame(
            [(uri(e),) for e in ("Alice", "Bob", "Dean")], "name string"
        )
        got = kg_graph3.pliterals(ents, [uri("knows")]).collect()
        by_ent = {}
        for r in got:
            by_ent.setdefault(r["entity"], set()).add(r["value"])
        assert by_ent[uri("Alice")] == {uri("Bob"), uri("Dean")}
        assert by_ent[uri("Bob")] == {uri("Casper")}
        assert uri("Dean") not in by_ent

    def test_get_literals_cast(self, spark):
        # float-else-string cast, reference kg.py:399-426
        t = spark.createDataFrame(
            [("e1", "p", "0.42"), ("e1", "p", "0.37"), ("e2", "p", "word")],
            "subj string, pred string, obj string",
        )
        kg = SparkKG(t, literals=[["p"]])
        ents = spark.createDataFrame([("e1",), ("e2",), ("e3",)], "e string")
        rows = {r["entity"]: r for r in kg.get_literals(ents).collect()}
        assert sorted(rows["e1"]["values_num"]) == [0.37, 0.42]
        assert rows["e2"]["values"] == ["word"]
        assert rows["e2"]["values_num"] == [None]
        # no literals → empty arrays (reference: np.NaN)
        assert rows["e3"]["values"] == []

    def test_chain_of_two(self, kg_chain, spark):
        ents = spark.createDataFrame([(uri("Alice"),)], "e string")
        got = kg_chain.pliterals(ents, [uri("knows"), uri("knows")]).collect()
        assert {r["value"] for r in got} == {uri("Mathilde")}


class TestRemoveEdge:
    def test_remove(self, kg_loop, spark):
        rm = spark.createDataFrame(
            [(uri("Alice"), uri("knows"), uri("Bob"))],
            "subj string, pred string, obj string",
        )
        kg2 = kg_loop.remove_edges(rm)
        assert kg2.edges.count() == 3
        assert kg2.get_hops(uri("Alice")).count() == 1
        # original untouched (immutable DataFrames)
        assert kg_loop.edges.count() == 4


class TestSkipPredicates:
    def test_skip(self, spark):
        t = spark.createDataFrame(
            [("a", "keep", "b"), ("a", "skip", "c")],
            "subj string, pred string, obj string",
        )
        kg = SparkKG(t, skip_predicates={"skip"})
        assert kg.edges.count() == 1
        assert kg.edges.first()["pred"] == "keep"


class TestTSVScan:
    def test_entities_tsv(self, spark, tmp_path):
        from pyrdf2vec_spark.graph import read_entities_tsv

        p = tmp_path / "ents.tsv"
        p.write_text("bond\tid\tlabel_mutagenic\nhttp://x#d1\t1.0\t0.0\n")
        got = read_entities_tsv(spark, str(p)).collect()
        assert got[0]["bond"] == "http://x#d1"
        assert got[0]["label_mutagenic"] == 0.0


class TestNTScan:
    def test_parse(self, spark, tmp_path):
        p = tmp_path / "g.nt"
        p.write_text(
            f'<{URL}#Alice> <{URL}#knows> <{URL}#Bob> .\n'
            f'<{URL}#Alice> <{URL}#age> "42.0" .\n'
            "# a comment\n\n"
        )
        got = {
            (r["subj"], r["pred"], r["obj"])
            for r in triples_from_nt(spark, str(p)).collect()
        }
        assert got == {
            (uri("Alice"), uri("knows"), uri("Bob")),
            (uri("Alice"), uri("age"), "42.0"),
        }
