"""Deterministic KG derivation from the driver's TPC-H-ish test tables.

Gives the engine a SQL-expressible graph at every scale factor — each
relationship edge is a projection of one table, so the same derivation
runs in DuckDB as the correctness oracle (driver contract). At sf0.1
this yields ~1.3M edges with realistic skew (hot parts/suppliers), which
is what the walk joins must survive.

Edge inventory (entity ids are 'kind:key' strings):
    c:<custkey>   -in_nation->   n:<nationkey>
    s:<suppkey>   -in_nation->   n:<nationkey>
    n:<nationkey> -in_region->   r:<regionkey>
    o:<orderkey>  -placed_by->   c:<custkey>
    o:<orderkey>  -contains->    p:<partkey>
    p:<partkey>   -supplied_by-> s:<suppkey>
    n:<nationkey> -has_name->    <n_name>       (literal chain target)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def _ent(kind: str, col) -> "F.Column":
    return F.concat(F.lit(f"{kind}:"), F.col(col).cast("string"))


def tpch_triples(t: dict[str, DataFrame]) -> DataFrame:
    """The KG triples table. Column-pruned scans (Catalyst pushes the
    2-3 column projection into each parquet read)."""
    parts = [
        t["customer"].select(
            _ent("c", "c_custkey").alias("subj"),
            F.lit("in_nation").alias("pred"),
            _ent("n", "c_nationkey").alias("obj"),
        ),
        t["supplier"].select(
            _ent("s", "s_suppkey").alias("subj"),
            F.lit("in_nation").alias("pred"),
            _ent("n", "s_nationkey").alias("obj"),
        ),
        t["nation"].select(
            _ent("n", "n_nationkey").alias("subj"),
            F.lit("in_region").alias("pred"),
            _ent("r", "n_regionkey").alias("obj"),
        ),
        t["orders"].select(
            _ent("o", "o_orderkey").alias("subj"),
            F.lit("placed_by").alias("pred"),
            _ent("c", "o_custkey").alias("obj"),
        ),
        t["lineitem"].select(
            _ent("o", "l_orderkey").alias("subj"),
            F.lit("contains").alias("pred"),
            _ent("p", "l_partkey").alias("obj"),
        ),
        t["lineitem"].select(
            _ent("p", "l_partkey").alias("subj"),
            F.lit("supplied_by").alias("pred"),
            _ent("s", "l_suppkey").alias("obj"),
        ),
        t["nation"].select(
            _ent("n", "n_nationkey").alias("subj"),
            F.lit("has_name").alias("pred"),
            F.col("n_name").alias("obj"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# The identical derivation in ANSI SQL (DuckDB oracle). Kept adjacent to
# the DataFrame builder so they evolve together.
TPCH_TRIPLES_SQL = """
SELECT 'c:' || CAST(c_custkey AS STRING) AS subj, 'in_nation' AS pred,
       'n:' || CAST(c_nationkey AS STRING) AS obj FROM customer
UNION ALL
SELECT 's:' || CAST(s_suppkey AS STRING), 'in_nation',
       'n:' || CAST(s_nationkey AS STRING) FROM supplier
UNION ALL
SELECT 'n:' || CAST(n_nationkey AS STRING), 'in_region',
       'r:' || CAST(n_regionkey AS STRING) FROM nation
UNION ALL
SELECT 'o:' || CAST(o_orderkey AS STRING), 'placed_by',
       'c:' || CAST(o_custkey AS STRING) FROM orders
UNION ALL
SELECT 'o:' || CAST(l_orderkey AS STRING), 'contains',
       'p:' || CAST(l_partkey AS STRING) FROM lineitem
UNION ALL
SELECT 'p:' || CAST(l_partkey AS STRING), 'supplied_by',
       's:' || CAST(l_suppkey AS STRING) FROM lineitem
UNION ALL
SELECT 'n:' || CAST(n_nationkey AS STRING), 'has_name', n_name FROM nation
"""

# deduplicated edge table (the SparkKG view of the same thing)
TPCH_EDGES_SQL = f"""
SELECT DISTINCT subj AS src, pred, obj AS dst FROM ({TPCH_TRIPLES_SQL})
"""
