"""Sampler weight tables as DataFrame aggregations.

Each reference sampler's ``fit(kg)`` (pyrdf2vec/samplers/*) is a global
aggregation over the graph; ``get_weight(hop)`` a lookup; ``get_weights``
normalizes per candidate-hop set (sampler.py:111-136: optional inverse
``max - (w - min)``, optional split ``w / distinct-in-degree(obj)``, then
divide by sum). Here: one agg producing a weight table, one join to attach
weights to candidate hops, and window functions for the per-hop-set
normalization — no per-vertex Python.

Weight semantics under the reference's per-occurrence predicate identity
(SURVEY.md §1.3): counts are over DISTINCT triples, which is exactly the
deduplicated edge table of :class:`~pyrdf2vec_spark.graph.SparkKG`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.session import release_local_checkpoint

SAMPLERS = (
    "uniform",
    "objfreq",
    "predfreq",
    "objpredfreq",
    "pagerank",
    "wide",
)


def edge_weights(kg: SparkKG, sampler: str = "uniform", alpha: float = 0.85) -> DataFrame:
    """Edge table with a raw (un-normalized) ``weight`` column per sampler.

    uniform     — 1.0 (uniform.py:49-69)
    objfreq     — distinct in-degree of the object (frequency.py:46-59)
    predfreq    — occurrences of the predicate name (frequency.py:116-130)
    objpredfreq — occurrences of the (pred, obj) pair (frequency.py:188-205)
    pagerank    — PageRank of the object over the entity graph
                  (pagerank.py:52-90, networkx-equivalent semantics)
    wide        — (nb(pred)+nb(obj)) * ((deg(pred)+deg(obj))/2)
                  (wide.py:50-96); under per-occurrence identity nb(pred)=1
                  and deg(obj)=1, nb(obj)=child-degree, deg(pred)=pred count
    """
    e = kg.edges
    if sampler == "uniform":
        return e.withColumn("weight", F.lit(1.0))
    if sampler == "objfreq":
        w = e.groupBy("dst").agg(F.count("*").alias("weight"))
        return e.join(w, "dst").select("src", "pred", "dst", F.col("weight").cast("double"))
    if sampler == "predfreq":
        w = e.groupBy("pred").agg(F.count("*").alias("weight"))
        return e.join(w, "pred").select("src", "pred", "dst", F.col("weight").cast("double"))
    if sampler == "objpredfreq":
        w = e.groupBy("pred", "dst").agg(F.count("*").alias("weight"))
        return e.join(w, ["pred", "dst"]).select(
            "src", "pred", "dst", F.col("weight").cast("double")
        )
    if sampler == "pagerank":
        pr = pagerank(kg, alpha=alpha)
        return e.join(pr, e["dst"] == pr["name"]).select(
            "src", "pred", "dst", F.col("rank").alias("weight")
        )
    if sampler == "wide":
        # neighbor count of an entity = distinct child edges (out-degree);
        # for predicate names it is constant 1 (one subject per occurrence).
        out_deg = e.groupBy("src").agg(F.count("*").alias("nc"))
        pred_cnt = e.groupBy("pred").agg(F.count("*").alias("pd"))
        w = (
            e.join(out_deg.withColumnRenamed("src", "dst"), "dst", "left")
            .join(pred_cnt, "pred")
            .select(
                "src",
                "pred",
                "dst",
                (
                    (F.lit(1.0) + F.coalesce(F.col("nc"), F.lit(0.0)))
                    * ((F.col("pd") + F.lit(1.0)) / F.lit(2.0))
                ).alias("weight"),
            )
        )
        return w
    raise ValueError(f"unknown sampler {sampler!r}; one of {SAMPLERS}")


def split_degrees(kg: SparkKG) -> DataFrame:
    """Distinct in-degree per entity vertex — the ``split`` normalization
    table (sampler.py:86-91). Columns (name, deg)."""
    e = kg.edges
    indeg = e.groupBy("dst").agg(F.count("*").alias("deg"))
    return (
        kg.entity_names()
        .join(indeg.withColumnRenamed("dst", "name"), "name", "left")
        .select("name", F.coalesce("deg", F.lit(0)).alias("deg"))
    )


def normalize_hop_weights(
    hops: DataFrame,
    group_cols: list[str],
    kg: SparkKG | None = None,
    inverse: bool = False,
    split: bool = False,
    weight_col: str = "weight",
    obj_col: str = "dst",
) -> DataFrame:
    """Per-candidate-set normalization of sampler.py:111-136 ``get_weights``.

    ``hops`` carries one row per candidate hop with a raw weight;
    ``group_cols`` identify the candidate set (e.g. the walk being
    extended). Applies, in reference order: inverse → split → sum-norm.
    Hops whose object has split-degree 0 are dropped under ``split``
    (sampler.py:132 guard).
    """
    win = Window.partitionBy(*group_cols)
    w = F.col(weight_col).cast("double")
    if inverse:
        w = F.max(w).over(win) - (w - F.min(w).over(win))
    df = hops.withColumn("_w", w)
    if split:
        if kg is None:
            raise ValueError("split=True requires kg")
        degs = split_degrees(kg).withColumnRenamed("name", obj_col)
        df = (
            df.join(degs, obj_col, "left")
            .where(F.coalesce(F.col("deg"), F.lit(0)) != 0)
            .withColumn("_w", F.col("_w") / F.col("deg"))
            .drop("deg")
        )
    total = F.sum("_w").over(Window.partitionBy(*group_cols))
    return df.withColumn(
        "norm_weight", F.when(total != 0, F.col("_w") / total)
    ).drop("_w")


def pagerank(
    kg: SparkKG,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1.0e-6,
) -> DataFrame:
    """DataFrame PageRank matching networkx semantics (pagerank.py:52-67
    builds a nx.DiGraph over entity vertices — parallel predicate edges
    collapse to one link, uniform teleport, dangling mass redistributed
    uniformly, L1 convergence err < N*tol).

    Iterative join/agg loop; ranks are re-persisted per iteration. The
    dangling-mass scalar stays IN the plan (one-row agg broadcast-cross-
    joined onto the update) — zero driver round-trips per iteration in
    fixed-iteration mode (tol=0); tol>0 adds the one L1-error collect
    that decides convergence. Vertex keys ride the loop as xxhash64
    ints (collision odds ~n²/2⁶⁵ — a collision would merge two vertices;
    at 10⁹ vertices that is ~3·10⁻²; swap to a dense-rank id table if
    that bound ever matters). Returns (name, rank).
    """
    # vertex keys are xxhash64 ints inside the loop: 20-100 iterations
    # each shuffle the links×ranks join, and 8-byte keys beat entity-name
    # strings through every round; names decode once at the end
    nid = lambda c: F.xxhash64(F.col(c))  # noqa: E731
    links = kg.edges.select(
        nid("src").alias("src"), nid("dst").alias("dst")
    ).distinct().persist()
    id_map = kg.entity_names().select(nid("name").alias("id"), "name").persist()
    nodes = id_map.select("id").persist()
    n = nodes.count()
    if n == 0:
        links.unpersist()
        id_map.unpersist()
        return kg.entity_names().withColumn("rank", F.lit(0.0))
    out_deg = links.groupBy("src").agg(F.count("*").alias("out_deg")).persist()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist()
    # the dangling-node SET is static — hoist it out of the loop so the
    # per-iteration mass probe is a semi-join against a small persisted
    # id table instead of re-running the nodes-vs-out_deg anti-join
    # every round (each round is ~9 tiny AQE stage jobs at graph sizes
    # where fixed stage overhead dominates; this removes ~2 of them)
    dangling_ids = nodes.join(
        out_deg.withColumnRenamed("src", "id"), "id", "left_anti"
    ).persist()
    base = (1.0 - alpha) / n
    # fixed-iteration mode (tol=0) has NO per-iteration driver action:
    # a LAZY localCheckpoint still truncates the SQL plan each round
    # (flat optimizer cost) but defers materialization, so all 20-100
    # rounds run as ONE job instead of max_iter driver-synchronized
    # jobs — measured 18.3 → 16.5 s warm / 45.8 → 17.9 s cold at sf0.1
    # ×20 iters. tol>0 collects the L1 error every round anyway, so it
    # keeps the eager checkpoint (the collect materializes it).
    eager = tol > 0
    stale: list[DataFrame] = []  # lazy mode: checkpoints awaiting release
    for _ in range(max_iter):
        contrib = (
            links.join(out_deg, "src")
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("in_sum"))
        )
        dangling = ranks.join(dangling_ids, "id", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        # localCheckpoint truncates lineage each iteration — without it
        # the logical plan doubles per loop and the driver OOMs ~50 iters in
        new_ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=eager)
        )
        if tol > 0:
            err = (
                new_ranks.join(
                    ranks.withColumnRenamed("rank", "old_rank"), "id"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("old_rank"))))
                .first()[0]
            )
        else:
            # tol <= 0 → fixed-iteration mode (deterministic plan shape,
            # no per-iteration convergence collect)
            err = None
        if eager:
            # eager mode materialized the new checkpoint, so the old
            # one's blocks can drop now. In LAZY mode unpersisting here
            # would strip the not-yet-materialized checkpoint's storage
            # level — every later reference (contrib + dangling read the
            # previous ranks TWICE per round) would then recompute its
            # whole chain when the single final job runs — so lazy mode
            # defers the release until after the single materializing job.
            release_local_checkpoint(ranks)
        else:
            stale.append(ranks)
        ranks = new_ranks
        if err is not None and err < n * tol:
            break
    out = id_map.join(ranks, "id").select("name", "rank")
    if not eager and stale:
        # materialize the FULL result as the ONE job fixed-iteration
        # mode promises (materializing just `ranks` instead measured
        # ~6 s slower at sf0.1: it serializes the id_map subtree that
        # a single job schedules in parallel with the rank chain), then
        # release every superseded round's MEMORY_AND_DISK blocks (plus
        # the seed persist, stale[0]) — without this, max_iter
        # intermediate checkpoints linger until py4j GC, pressuring
        # executor storage on large graphs / long-lived sessions. The
        # final checkpoint stays persisted (the persisted result's
        # recompute path reads it); both are |V|-row tables.
        out = out.persist()
        out.count()
        for df in stale:
            release_local_checkpoint(df)
    links.unpersist()
    out_deg.unpersist()
    nodes.unpersist()
    id_map.unpersist()
    dangling_ids.unpersist()
    return out
