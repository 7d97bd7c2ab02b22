"""Sampler-weight parity with /root/reference/tests/samplers/* —
hand-computed fit() tables on the fixture graphs, get_weights
normalization invariants, and PageRank cross-checked against networkx
(the reference's own implementation backend, pagerank.py:52-90)."""

import math

import pytest
from pyspark.sql import functions as F

from pyrdf2vec_spark.samplers import (
    SAMPLERS,
    edge_weights,
    normalize_hop_weights,
    pagerank,
    split_degrees,
)
from tests.conftest import uri


def wmap(df):
    return {
        (r["src"], r["pred"], r["dst"]): r["weight"] for r in df.collect()
    }


class TestFitTables:
    def test_uniform(self, kg_loop):
        assert set(wmap(edge_weights(kg_loop, "uniform")).values()) == {1.0}

    def test_objfreq(self, kg_loop):
        # distinct in-degrees on LOOP: Bob 1, Dean 2, Alice 1
        w = wmap(edge_weights(kg_loop, "objfreq"))
        assert w[(uri("Alice"), uri("knows"), uri("Bob"))] == 1.0
        assert w[(uri("Alice"), uri("knows"), uri("Dean"))] == 2.0
        assert w[(uri("Bob"), uri("knows"), uri("Dean"))] == 2.0
        assert w[(uri("Dean"), uri("loves"), uri("Alice"))] == 1.0

    def test_predfreq(self, kg_loop):
        # knows ×3, loves ×1
        w = wmap(edge_weights(kg_loop, "predfreq"))
        assert w[(uri("Alice"), uri("knows"), uri("Bob"))] == 3.0
        assert w[(uri("Dean"), uri("loves"), uri("Alice"))] == 1.0

    def test_objpredfreq(self, kg_loop):
        # (knows,Dean) ×2; others ×1
        w = wmap(edge_weights(kg_loop, "objpredfreq"))
        assert w[(uri("Alice"), uri("knows"), uri("Dean"))] == 2.0
        assert w[(uri("Bob"), uri("knows"), uri("Dean"))] == 2.0
        assert w[(uri("Alice"), uri("knows"), uri("Bob"))] == 1.0

    def test_wide(self, kg_loop):
        # wide.py:93-96 — (nb(pred)+nb(obj)) * ((deg(pred)+deg(obj))/2)
        # nb(pred)=1, deg(obj)=1; nb(obj)=out-degree, deg(pred)=pred count
        w = wmap(edge_weights(kg_loop, "wide"))
        # hop Alice-knows->Bob: nb(Bob)=1 (Bob knows Dean), deg(knows)=3
        assert w[(uri("Alice"), uri("knows"), uri("Bob"))] == (1 + 1) * ((3 + 1) / 2)
        # hop Dean-loves->Alice: nb(Alice)=2, deg(loves)=1
        assert w[(uri("Dean"), uri("loves"), uri("Alice"))] == (1 + 2) * ((1 + 1) / 2)

    def test_split_degrees(self, kg_loop):
        d = {r["name"]: r["deg"] for r in split_degrees(kg_loop).collect()}
        assert d == {uri("Alice"): 1, uri("Bob"): 1, uri("Dean"): 2}


class TestNormalization:
    @pytest.mark.parametrize("sampler", [s for s in SAMPLERS if s != "pagerank"])
    @pytest.mark.parametrize("inverse", [False, True])
    @pytest.mark.parametrize("split", [False, True])
    def test_weights_normalized(self, kg_loop, sampler, inverse, split):
        # tests/samplers/test_sampler.py:78-93 — normalized weights ≤ 1,
        # and each candidate set sums to 1
        w = edge_weights(kg_loop, sampler)
        norm = normalize_hop_weights(
            w, ["src"], kg=kg_loop, inverse=inverse, split=split
        )
        rows = norm.collect()
        assert rows
        sums = {}
        for r in rows:
            assert r["norm_weight"] is None or r["norm_weight"] <= 1.0 + 1e-9
            if r["norm_weight"] is not None:
                sums[r["src"]] = sums.get(r["src"], 0.0) + r["norm_weight"]
        for s in sums.values():
            assert math.isclose(s, 1.0, rel_tol=1e-9)

    def test_inverse_flips_preference(self, kg_loop):
        w = edge_weights(kg_loop, "objfreq")
        norm = {
            (r["src"], r["dst"]): r["norm_weight"]
            for r in normalize_hop_weights(w, ["src"], kg=kg_loop, inverse=True).collect()
        }
        # Alice's hops: Bob (raw 1), Dean (raw 2) → inverse: Bob 2, Dean 1
        assert norm[(uri("Alice"), uri("Bob"))] == pytest.approx(2 / 3)
        assert norm[(uri("Alice"), uri("Dean"))] == pytest.approx(1 / 3)


class TestPageRank:
    @staticmethod
    def _reference_pagerank(links, alpha, tol=1e-6, max_iter=100):
        """Pure-Python replica of networkx.pagerank semantics (power
        iteration, uniform teleport + dangling redistribution, L1 stop
        err < N*tol) — networkx itself needs scipy, absent here."""
        nodes = sorted({u for u, _ in links} | {v for _, v in links})
        out = {}
        for u, v in links:
            out.setdefault(u, set()).add(v)
        n = len(nodes)
        x = {v: 1.0 / n for v in nodes}
        for _ in range(max_iter):
            xlast = x
            x = {v: 0.0 for v in nodes}
            dangle = sum(xlast[v] for v in nodes if v not in out)
            for u, succs in out.items():
                share = alpha * xlast[u] / len(succs)
                for v in succs:
                    x[v] += share
            for v in nodes:
                x[v] += alpha * dangle / n + (1.0 - alpha) / n
            if sum(abs(x[v] - xlast[v]) for v in nodes) < n * tol:
                break
        return x

    @pytest.mark.parametrize("alpha", [0.4, 0.85])
    def test_matches_networkx_semantics(self, kg_loop, kg_chain, alpha):
        for kg in (kg_loop, kg_chain):
            links = {(r["src"], r["dst"]) for r in kg.edges.collect()}
            expect = self._reference_pagerank(links, alpha)
            got = {r["name"]: r["rank"] for r in pagerank(kg, alpha=alpha).collect()}
            assert set(got) == set(expect)
            for k in expect:
                assert got[k] == pytest.approx(expect[k], abs=1e-5)

    def test_weight_bounded_by_alpha(self, kg_loop):
        # tests/samplers/test_pagerank.py:76-84
        got = pagerank(kg_loop, alpha=0.85)
        assert all(r["rank"] <= 0.85 for r in got.collect())

    def test_lazy_mode_releases_intermediate_checkpoints(self, kg_loop, spark):
        # tol=0 runs max_iter lazy localCheckpoints; superseded rounds'
        # blocks must be released after the single materializing job
        # (DataFrame.unpersist alone is a CacheManager no-op for
        # checkpoint RDDs — session.release_local_checkpoint reaches
        # the LogicalRDD leaf). Budget: edges + final checkpoint + one
        # transient, NOT one block per iteration.
        import time

        jsc = spark.sparkContext._jsc.sc()

        def rdd_ids():
            it = jsc.getPersistentRDDs().keysIterator()
            ids = set()
            while it.hasNext():
                ids.add(it.next())
            return ids

        before = rdd_ids()
        got = pagerank(kg_loop, max_iter=25, tol=0.0)
        assert got.count() == 3  # LOOP has vertices Alice/Bob/Dean
        # the releases are non-blocking unpersists — poll briefly so a
        # loaded suite run doesn't read entries mid-removal
        # budget: final checkpoint + persisted result + up to two
        # transients — NOT one block set per iteration
        deadline = time.time() + 30
        leaked = rdd_ids() - before
        while len(leaked) > 4 and time.time() < deadline:
            time.sleep(0.5)
            leaked = rdd_ids() - before
        if len(leaked) > 4:
            info = {
                i.id(): (i.name(), i.numCachedPartitions())
                for i in jsc.getRDDStorageInfo()
                if i.id() in leaked
            }
            raise AssertionError(
                f"lazy pagerank leaked checkpoint blocks: {sorted(leaked)} "
                f"storage={info}"
            )

    def test_pagerank_edge_weights(self, kg_loop):
        w = wmap(edge_weights(kg_loop, "pagerank"))
        assert len(w) == 4
        assert all(0 < v < 1 for v in w.values())


class TestPagerankStaticCache:
    def test_static_tables_cached_and_reused(self, kg_loop):
        # the loop-invariant tables build once per KG; repeat pagerank
        # calls (and the pagerank sampler) reuse the cached tuple
        from pyrdf2vec_spark.samplers import pagerank, _pagerank_static

        n1 = pagerank(kg_loop, max_iter=3, tol=0.0).count()
        st = getattr(kg_loop, "_pagerank_static", None)
        assert st is not None
        n2 = pagerank(kg_loop, max_iter=3, tol=0.0).count()
        assert n2 == n1
        assert kg_loop._pagerank_static is st  # same tuple, no rebuild
        links_w, nodes, id_map, n, n_dangling, loop_p = st
        assert n == n1 and loop_p >= 1 and n_dangling >= 0
