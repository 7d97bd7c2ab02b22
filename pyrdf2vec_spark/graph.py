"""DataFrame-native knowledge graph.

The reference KG (pyrdf2vec/graphs/kg.py:18-141) keeps adjacency as two
dict-of-sets (`_transition_matrix` / `_inv_transition_matrix`) with a
per-occurrence predicate-vertex identity (pyrdf2vec/graphs/vertex.py:20-51).
Under that identity the structure is exactly an edge-labeled graph, so we
keep ONE deduplicated `edges(src, pred, dst)` DataFrame; the "inverse
matrix" is the same DataFrame joined on `dst` (SURVEY.md §1.1/§1.3).

Hops (kg.py:445-467 `_get_hops`) ≡ distinct `(pred, dst)` rows at a given
`src`. The reference's TTL hop-cache (kg.py:107-112) maps to `.persist()` —
Spark's batch joins replace per-vertex memoized lookups.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel


class SparkKG:
    """Columnar knowledge graph over a triples DataFrame.

    Args:
        triples: DataFrame(subj, pred, obj). Duplicates collapse (the
            reference's set-based adjacency dedupes identical triples).
        skip_predicates: predicate URIs to drop at build time
            (kg.py:209 `add_walk` skip; pushed into the scan by Catalyst).
        literals: list of predicate chains for literal extraction
            (kg.py:330-350 get_pliterals).
    """

    def __init__(
        self,
        triples: DataFrame,
        skip_predicates: Iterable[str] | None = None,
        literals: Sequence[Sequence[str]] | None = None,
        persist: bool = True,
    ):
        self.skip_predicates = set(skip_predicates or [])
        self.literals = [list(chain) for chain in (literals or [])]
        t = triples.select(
            F.col("subj").cast("string"),
            F.col("pred").cast("string"),
            F.col("obj").cast("string"),
        )
        if self.skip_predicates:
            # Early predicate filter — Catalyst pushes this below joins.
            t = t.where(~F.col("pred").isin(list(self.skip_predicates)))
        # Set semantics of the reference adjacency: dedup once, up front.
        self._edges = t.selectExpr(
            "subj as src", "pred", "obj as dst"
        ).dropDuplicates(["src", "pred", "dst"])
        if persist:
            # Reference memoizes per-vertex hops in a TTLCache; we cache the
            # whole (deduped) edge table — every walker/sampler reuses it.
            self._edges = self._edges.persist(StorageLevel.MEMORY_AND_DISK)

    # ------------------------------------------------------------------
    # Derived tables
    # ------------------------------------------------------------------
    @property
    def edges(self) -> DataFrame:
        """Deduplicated (src, pred, dst) edge table."""
        return self._edges

    def edge_count(self) -> int:
        """Cached edge count (drives broadcast-vs-shuffle decisions)."""
        if getattr(self, "_edge_count", None) is None:
            self._edge_count = self._edges.count()
        return self._edge_count

    def vertices(self) -> DataFrame:
        """All vertices with entity/predicate classification.

        A name can be both an entity and (separately) a predicate — the
        reference stores those as distinct Vertex objects (kg.py:181-194),
        so a name may appear here twice with both flags.
        """
        e = self._edges
        ents = self.entity_names().withColumn(
            "is_predicate", F.lit(False)
        )
        preds = (
            e.select(F.col("pred").alias("name"))
            .distinct()
            .withColumn("is_predicate", F.lit(True))
        )
        return ents.unionByName(preds)

    def entity_names(self) -> DataFrame:
        """Distinct non-predicate vertex names, column `name`.

        Cached (lazily persisted) after the first call: every walker
        references it 2-4× per run — seeds, vertex tokens, vocab roots
        — and without the cache each reference re-runs the 2|E|-row
        union-distinct (measured: several seconds of the walk stage's
        fixed cost at 4M edges, at BOTH parallelism levels)."""
        if getattr(self, "_entity_names", None) is None:
            e = self._edges
            names = (
                e.select(F.col("src").alias("name"))
                .union(e.select(F.col("dst").alias("name")))
                .distinct()
            )
            self._entity_names = names.persist(StorageLevel.MEMORY_AND_DISK)
        return self._entity_names

    # ------------------------------------------------------------------
    # Bulk hop / neighbor operators (kg.py get_hops / get_neighbors)
    # ------------------------------------------------------------------
    def hops(self, frontier: DataFrame, node_col: str, is_reverse: bool = False) -> DataFrame:
        """Bulk form of kg.py:241-256 `get_hops`: one join replaces the
        reference's N+1 per-vertex adjacency lookups (and its async SPARQL
        bundling, connectors.py:89-119 — Spark batching IS the bundling).

        Returns frontier columns + (pred, other) where `other` is the
        child (or parent when ``is_reverse``).
        """
        e = self._edges
        if is_reverse:
            joined = frontier.join(e, frontier[node_col] == e["dst"], "inner")
            return joined.drop("dst").withColumnRenamed("src", "other")
        joined = frontier.join(e, frontier[node_col] == e["src"], "inner")
        return joined.drop("src").withColumnRenamed("dst", "other")

    def get_hops(self, vertex: str, is_reverse: bool = False) -> DataFrame:
        """Single-vertex hops — (pred, obj) rows, for API/test parity with
        kg.py get_hops. Prefer :meth:`hops` for anything bulk."""
        e = self._edges
        if is_reverse:
            return e.where(F.col("dst") == vertex).select(
                "pred", F.col("src").alias("obj")
            )
        return e.where(F.col("src") == vertex).select(
            "pred", F.col("dst").alias("obj")
        )

    def get_neighbors(self, vertex: str, is_reverse: bool = False) -> DataFrame:
        """kg.py:311-328 — distinct neighbor entities of an entity vertex."""
        return self.get_hops(vertex, is_reverse).select(
            F.col("obj").alias("name")
        ).distinct()

    # ------------------------------------------------------------------
    # Existence gate (kg.py:352-375 is_exist / rdf2vec.py:166-172)
    # ------------------------------------------------------------------
    def is_exist(self, entities: DataFrame) -> bool:
        """True iff every entity name occurs as a vertex. Anti-join — no
        per-entity ASK queries."""
        missing = entities.select(F.col(entities.columns[0]).alias("name")).join(
            self.entity_names(), "name", "left_anti"
        )
        return missing.isEmpty()

    def missing_entities(self, entities: DataFrame) -> DataFrame:
        return entities.select(F.col(entities.columns[0]).alias("name")).join(
            self.entity_names(), "name", "left_anti"
        )

    # ------------------------------------------------------------------
    # Mutation (G5 remove_edge — tests only in the reference)
    # ------------------------------------------------------------------
    def remove_edges(self, removed: DataFrame) -> "SparkKG":
        """kg.py:377-397 remove_edge, set-subtraction form. Returns a new
        SparkKG (DataFrames are immutable; Iceberg DELETE WHERE in prod)."""
        kept = self._edges.join(
            removed.selectExpr("subj as src", "pred", "obj as dst"),
            ["src", "pred", "dst"],
            "left_anti",
        )
        out = SparkKG.__new__(SparkKG)
        out.skip_predicates = set(self.skip_predicates)
        out.literals = [list(c) for c in self.literals]
        out._edges = kept
        return out

    # ------------------------------------------------------------------
    # Literals (G8: kg.py:330-350 get_pliterals + 399-426 _cast_literals)
    # ------------------------------------------------------------------
    def pliterals(self, entities: DataFrame, chain: Sequence[str]) -> DataFrame:
        """Frontier-BFS along a fixed predicate chain: k chained equi-joins
        (the reference walks the chain vertex-at-a-time; Catalyst turns
        this into k hash joins with the predicate filter pushed down).

        Returns (entity, value) distinct rows at the end of the chain.
        """
        cur = entities.select(
            F.col(entities.columns[0]).alias("entity")
        ).withColumn("node", F.col("entity"))
        for p in chain:
            step = self._edges.where(F.col("pred") == p).select("src", "dst")
            cur = (
                cur.join(step, cur["node"] == step["src"], "inner")
                .select("entity", F.col("dst").alias("node"))
                .dropDuplicates(["entity", "node"])
            )
        return cur.select("entity", F.col("node").alias("value"))

    def get_literals(self, entities: DataFrame) -> DataFrame:
        """All configured literal chains for each entity, with the
        reference's float-else-string cast (kg.py:417-421 → try_cast).

        Returns (entity, chain_idx, values array<string>,
        values_num array<double> — null where not castable). Empty result
        sets surface as an empty array (reference: np.NaN, kg.py:414).
        """
        outs = []
        ent = entities.select(F.col(entities.columns[0]).alias("entity"))
        for i, chain in enumerate(self.literals):
            vals = (
                self.pliterals(ent, chain)
                .groupBy("entity")
                .agg(F.sort_array(F.collect_list("value")).alias("values"))
            )
            # left join: entities with no literal values keep empty array
            part = ent.join(vals, "entity", "left").select(
                "entity",
                F.lit(i).alias("chain_idx"),
                F.coalesce("values", F.array().cast("array<string>")).alias(
                    "values"
                ),
            )
            outs.append(part)
        if not outs:
            spark = entities.sparkSession
            return spark.createDataFrame(
                [], "entity string, chain_idx int, values array<string>, values_num array<double>"
            )
        res = outs[0]
        for o in outs[1:]:
            res = res.unionByName(o)
        return res.withColumn(
            "values_num",
            F.expr("transform(values, v -> try_cast(v as double))"),
        )


def read_entities_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S7 — seed-entity TSV scan (examples/mutag.py:17-27 pattern:
    pd.read_csv(sep='\\t') of entity URIs + labels). First column is the
    entity URI; any remaining columns ride along."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("inferSchema", "true")
        .csv(path)
    )


def triples_from_nt(spark: SparkSession, path: str) -> DataFrame:
    """Minimal N-Triples file scan (S1 stand-in for rdflib parse,
    kg.py:153-155) — line-oriented, Catalyst regex extraction, no
    per-row Python. Handles `<s> <p> <o> .` and literal objects."""
    lines = spark.read.text(path).where(
        (F.length(F.trim("value")) > 0) & ~F.col("value").startswith("#")
    )
    pat = r'^\s*<([^>]+)>\s+<([^>]+)>\s+(<[^>]+>|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]+>|@\S+)?)\s*\.\s*$'
    parsed = lines.select(
        F.regexp_extract("value", pat, 1).alias("subj"),
        F.regexp_extract("value", pat, 2).alias("pred"),
        F.regexp_extract("value", pat, 3).alias("obj_raw"),
    ).where(F.col("subj") != "")
    return parsed.select(
        "subj",
        "pred",
        F.when(
            F.col("obj_raw").startswith("<"),
            F.regexp_extract("obj_raw", r"^<([^>]+)>$", 1),
        )
        .otherwise(F.regexp_extract("obj_raw", r'^"((?:[^"\\]|\\.)*)"', 1))
        .alias("obj"),
    )
