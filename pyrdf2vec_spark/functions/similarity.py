"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k (query-set × corpus join, sequential
fold dot product — bit-identical to DuckDB's list_cosine_similarity for
oracle parity). Scale path: IVF-style coarse quantization — assign every
vector to its nearest of C centroids (deterministic seeded sample), then
search only the probe-nearest cells: turns the O(Q×N) join into
O(Q×N×probes/C) with the centroid table broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), "
    "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
)
_NORM = "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * x))"


def _cosine(a: str, b: str):
    return F.expr(_DOT.format(a=a, b=b)) / (
        F.expr(_NORM.format(a=a)) * F.expr(_NORM.format(a=b))
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector. The query side is small by
    assumption → broadcast; corpus side streams. Ties broken by
    neighbor id (stable, engine-independent)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine("qv", "cv"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i / scale + 0.5) ∈ [-127, 127]. 4× smaller than
    float32 — the standard memory lever for corpus-scale ANN (int8
    vectors stay in executor memory where float32 spills). Pure
    Catalyst, partition-local, zero shuffle. Cosine is invariant to the
    per-vector scale, so quantized cosine ≈ full-precision cosine with
    only rounding error.

    floor(x + 0.5) is used instead of round() so the Spark and DuckDB
    (oracle) sides share one deterministic rounding rule. All-zero
    vectors quantize to zeros with scale 0.

    Returns (id_col, qvec array<int>, scale double).
    """
    v = vec_col
    maxabs = f"array_max(transform({v}, x -> abs(CAST(x AS DOUBLE))))"
    scale = f"({maxabs} / 127.0D)"
    qvec = (
        f"CASE WHEN {maxabs} = 0.0D THEN transform({v}, x -> 0) "
        f"ELSE transform({v}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) / {scale} + 0.5D) AS INT)) END"
    )
    return embeddings.select(
        F.col(id_col),
        F.expr(qvec).alias("qvec"),
        F.expr(scale).alias("scale"),
    )


def quantized_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors — the
    4×-less-memory approximate baseline (per-vector scales cancel in
    cosine, so only quantization rounding separates this from
    :func:`brute_force_topk`)."""
    qemb = quantize_embeddings(embeddings, id_col, vec_col)
    qq = quantize_embeddings(queries, id_col, vec_col)
    return brute_force_topk(
        qemb, qq, k=k, id_col=id_col, vec_col="qvec"
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: the n vectors whose md5(id) sorts
    first (cheap, seedless, k-means-free choice — one Lloyd round could
    refine later; ANN quality, not exactness, is the contract).

    orderBy().limit(n) compiles to TakeOrderedAndProject — per-partition
    top-n then a driver-side merge of n·P candidates — so the full
    corpus never funnels through one partition (the previous global
    no-partitionBy Window did exactly that). The id-assigning window
    below runs AFTER the limit, over n rows only.
    """
    chosen = (
        embeddings.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("centroid")
        )
        .withColumn("ord", F.md5(F.col("cid").cast("string")))
        .orderBy("ord")
        .limit(n_centroids)
    )
    win = Window.orderBy("ord")  # n_centroids rows — trivially single-node
    return chosen.select(
        (F.row_number().over(win) - 1).alias("centroid_id"), "centroid"
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (broadcast join +
    min_by aggregation — one narrow shuffle)."""
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    joined = e.join(F.broadcast(centroids)).withColumn(
        "sim", _cosine("v", "centroid")
    )
    return joined.groupBy("id").agg(
        F.max_by("centroid_id", F.struct(F.col("sim"), -F.col("centroid_id"))).alias(
            "centroid_id"
        ),
        F.first("v").alias("v"),
    )


def ivf_probe_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe assignment: every vector keeps its ``n_probes``
    max-cosine centroids (one row per (vector, cell)). n_probes=1
    degenerates to ivf_assign. Broadcast centroid join + per-vector
    window over C rows — narrow, no corpus-wide shuffle."""
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    joined = e.join(F.broadcast(centroids)).withColumn(
        "sim", _cosine("v", "centroid")
    )
    win = Window.partitionBy("id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    return (
        joined.withColumn("prank", F.row_number().over(win))
        .where(F.col("prank") <= n_probes)
        .select("id", "v", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: per query, rank centroids by cosine, keep
    n_probes cells, search only vectors assigned there. Recall grows
    with n_probes; n_probes == n_centroids degenerates to exact."""
    cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col).persist()
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probe_win = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        F.broadcast(q)
        .join(F.broadcast(cents))
        .withColumn("csim", _cosine("qv", "centroid"))
        .withColumn("prank", F.row_number().over(probe_win))
        .where(F.col("prank") <= n_probes)
        .select("query_id", "qv", "centroid_id")
    )
    scored = (
        probes.join(assigned, "centroid_id")
        .where(F.col("query_id") != F.col("id"))
        .withColumn("cosine", _cosine("qv", "v"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("id").alias("neighbor_id"), "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )
