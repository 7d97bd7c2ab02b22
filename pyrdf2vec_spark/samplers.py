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

# pagerank lazy mode: materialize (eager localCheckpoint) every k-th
# round so the RDD lineage depth stays bounded (see the loop comment).
# 8 vs 12 measured NEUTRAL across two interleaved A/Bs (first read
# −0.5 s for 12, the rerun +0.5 s — noise), so the value with the
# larger stack-depth margin below the ~50-round serialization
# overflow stays.
LINEAGE_EVERY = 8


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
    links_w, nodes, id_map, n, n_dangling, loop_p = _pagerank_static(kg)
    if n == 0:
        return kg.entity_names().withColumn("rank", F.lit(0.0))
    # AQE is scoped OFF for the loop (restored in finally): the join
    # geometry is pinned (merge hints + co-partitioned static tables),
    # so runtime re-planning buys nothing and costs one driver
    # re-planning pause per materialized stage — the r6 stage
    # decomposition measured ~13 s of q5's 21 s as exactly this
    # (20 rounds × ~9 tiny AQE stage jobs). With AQE off, lazy
    # fixed-iteration mode runs all rounds as ONE multi-stage job.
    conf = kg.edges.sparkSession.conf
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    old_parts = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(loop_p))
        return _pagerank_loop(
            links_w, id_map, nodes, n, n_dangling, alpha, max_iter, tol
        )
    finally:
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        conf.set("spark.sql.shuffle.partitions", old_parts)


def _pagerank_static(kg: SparkKG) -> tuple:
    """The loop-invariant pagerank tables, cached per KG (immutable
    after construction, same contract as the walkers' edge-table
    caches): the (1/out-degree)-weighted link table pre-partitioned +
    pre-sorted on ``src``, the node id table pre-partitioned on ``id``,
    the id→name map, |V|, and the loop partition count. Repeat
    pagerank calls (bench reps, the pagerank sampler) skip the
    distinct/count/repartition prelude entirely.

    Scale-adaptive loop partitioning: the loop's join geometry is
    static, so partition count derives from the edge count (~2M
    16-byte link rows ≈ 100-MB-class partitions, guide §2.2), floored
    at 4 and capped at the session's configured shuffle parallelism —
    NOT a constant tuned to the local core count. 20-100 rounds
    multiply any per-stage task overage, so surplus tiny tasks cost
    more here than anywhere else in the engine (r6 decomposition:
    ~200 AQE stage jobs × ~180 tasks for an 18k-vertex graph)."""
    got = getattr(kg, "_pagerank_static", None)
    if got is not None:
        return got
    # vertex keys are xxhash64 ints inside the loop: 20-100 iterations
    # each shuffle the links×ranks join, and 8-byte keys beat entity-
    # name strings through every round; names decode once at the end
    nid = lambda c: F.xxhash64(F.col(c))  # noqa: E731
    spark = kg.edges.sparkSession
    sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loop_p = min(sess_parts, max(4, -(-kg.edge_count() // 2_000_000)))
    # the static tables are EAGER local checkpoints, not plain persists:
    # a persisted DataFrame's logical plan still carries its full build
    # lineage, and the analyzer/optimizer re-traverse it inside every
    # round's plan — measured as ~0.3 s of driver planning per
    # localCheckpoint call (6.3 of a 10.5 s warm run). A checkpoint
    # collapses each table to a single LogicalRDD leaf (partitioning
    # preserved — unlike the stats-free rewrap, which drops it and
    # would re-exchange |E| rows every round). Stats stay linear
    # across rounds: the dangling branch collapses through a 1-row
    # global agg exactly as before (see session.hard_local_checkpoint).
    id_map = (
        kg.entity_names()
        .select(nid("name").alias("id"), "name")
        .localCheckpoint(eager=True)
    )
    nodes = (
        id_map.select("id")
        .repartition(loop_p, "id")
        .sortWithinPartitions("id")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # links needs no persist of its own: both consumers below (the
    # out-degree agg and the join) reuse its distinct's exchange
    # within the one job that materializes links_w
    links = kg.edges.select(
        nid("src").alias("src"), nid("dst").alias("dst")
    ).distinct()
    out_deg = links.groupBy("src").agg(F.count("*").alias("out_deg"))
    links_w = (
        links.join(out_deg, "src")
        .select("src", "dst", "out_deg")
        .repartition(loop_p, "src")
        .sortWithinPartitions("src")
        .localCheckpoint(eager=True)
    )
    # whether the graph has dangling nodes at all is static — it decides
    # the shape of the per-round dangling-mass branch (see _pagerank_loop)
    n_dangling = n - links_w.select("src").distinct().count()
    kg._pagerank_static = (links_w, nodes, id_map, n, n_dangling, loop_p)
    return kg._pagerank_static


def _pagerank_loop(
    links_w: DataFrame,
    id_map: DataFrame,
    nodes: DataFrame,
    n: int,
    n_dangling: int,
    alpha: float,
    max_iter: int,
    tol: float,
) -> DataFrame:
    """The iteration body of :func:`pagerank`, run under the scoped
    conf (AQE off, link-derived shuffle partitioning).

    Every static table is pre-partitioned AND pre-sorted on its loop
    join key, so the per-round plan has exactly TWO data exchanges:
    the contribution groupBy("dst") agg (the one shuffle PageRank
    fundamentally needs) and the per-round state exchange back onto
    the link key. The old shape re-joined links⋈out_deg every round,
    ran a separate dangling semi-join, and broadcast the dangling
    scalar via a per-round driver-synchronized job (~5 exchanges →
    ~9 AQE stage jobs per round)."""
    base = (1.0 - alpha) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist()
    # fixed-iteration mode (tol=0) has NO per-iteration driver action:
    # a LAZY localCheckpoint still truncates the SQL plan each round
    # (flat optimizer cost) but defers materialization, so all 20-100
    # rounds run as ONE job instead of max_iter driver-synchronized
    # jobs. tol>0 collects the L1 error every round anyway, so it
    # keeps the eager checkpoint (the collect materializes it).
    eager = tol > 0
    stale: list[DataFrame] = []  # lazy mode: checkpoints awaiting release
    # unresolved Column expressions bind by name at analysis, so every
    # per-round expression is built ONCE here and reused — each F.col/
    # F.lit/operator is a py4j round-trip, and the loop otherwise pays
    # ~30 of them per round (profiled: ~6.9k gateway calls per call)
    in_sum_expr = F.sum(F.col("rank") / F.col("out_deg")).alias("in_sum")
    dmp_expr = F.sum(
        F.when(F.col("dst").isNull(), F.col("rank"))
    ).alias("_dmp")
    dst_notnull = F.col("dst").isNotNull()
    dm_expr = F.coalesce(F.sum("_dmp"), F.lit(0.0)).alias("_dm")
    if n_dangling > 0:
        rank_expr = (
            F.lit(base)
            + F.lit(alpha)
            * (
                F.coalesce(F.col("in_sum"), F.lit(0.0))
                + F.col("_dm") / F.lit(float(n))
            )
        ).alias("rank")
    else:
        # no dangling nodes: _dm is identically 0.0 and x + 0.0 is
        # bit-identical to x for the non-negative sums here, so the
        # whole dangling branch (and its cross join) disappears
        rank_expr = (
            F.lit(base)
            + F.lit(alpha) * F.coalesce(F.col("in_sum"), F.lit(0.0))
        ).alias("rank")
    for it in range(max_iter):
        # ONE pass computes both per-round aggregates: ranks LEFT JOIN
        # the weighted link table — a rank row with no out-links is
        # exactly a dangling node and lands in the null-dst group, so
        # the dangling mass is that group's sum(rank) and the r6 shape's
        # per-round semi-join, its exchange, and the static dangling_ids
        # table all disappear. The agg exchange below is computed once
        # and REUSED by the broadcast subtree (ReuseExchange; AQE off).
        agg = (
            ranks.withColumnRenamed("id", "src")
            .hint("merge")
            .join(links_w, "src", "left")
            .groupBy("dst")
            .agg(in_sum_expr, dmp_expr)
        )
        contrib = agg.where(dst_notnull).select("dst", "in_sum")
        joined = nodes.hint("merge").join(
            contrib.withColumnRenamed("dst", "id"), "id", "left"
        )
        if n_dangling > 0:
            # the dangling mass is the null-dst group's sum — extracted
            # via a 1-row GLOBAL agg, deliberately: the global agg
            # collapses the branch's size estimate to one row, keeping
            # the per-round plan stats LINEAR. A plain filter here
            # passes the child estimate through, the round's join then
            # SQUARES it, and by round ~25 the optimizer is multiplying
            # million-bit BigIntegers (the session.hard_local_checkpoint
            # wedge — reproduced and thread-dumped on this exact shape).
            # The 1-row scalar crosses in as a replicated nested-loop
            # (cartesian), NOT a broadcast: a BroadcastExchange would
            # run one driver-synchronized job per round (measured
            # ~0.25 s × rounds), while the replicate form keeps every
            # round inside the one lazy job.
            dangling = agg.agg(dm_expr)
            joined = joined.crossJoin(dangling.hint("shuffle_replicate_nl"))
        # localCheckpoint truncates lineage each iteration — without it
        # the logical plan doubles per loop and the driver OOMs ~50 iters in
        new_ranks = (
            joined.select("id", rank_expr)
            # lazy checkpoints truncate the LOGICAL plan only; the RDD
            # lineage keeps chaining until something materializes, and
            # task serialization recurses over that graph — unbounded
            # depth overflows the JVM stack at ~50+ rounds (the r6
            # shape's per-round broadcast jobs were incidentally
            # materializing each round, masking this). One EAGER
            # checkpoint every LINEAGE_EVERY rounds bounds the depth;
            # the blocks it caches are exactly what the final job
            # reads, so no work is duplicated.
            .localCheckpoint(
                eager=eager or (it + 1) % LINEAGE_EVERY == 0
            )
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
    # the static tables (links_w / nodes / id_map) stay persisted in
    # the per-KG cache — see _pagerank_static
    return out
