"""Structured-Streaming ingestion: transcripts land as parquet files,
triples accrete incrementally, and the KG stays current.

The reference's closest analogue is the online-update path
(pyrdf2vec/rdf2vec.py:248-272 `_update` + Word2Vec ``is_update``); here
the incremental unit is a micro-batch of NEW transcript files:
extraction is stateless per turn (partition-local Arrow UDF), and the
sink-side dedup is an anti-join against the accumulated triple set —
with Iceberg this becomes MERGE INTO, the parquet fallback is
append-of-novel-rows.

Also provides the watermarked windowed aggregation shape (late-data
tolerant turn rates) for monitoring streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from pyrdf2vec_spark.extract import extract_triples, triples_only
from pyrdf2vec_spark.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of transcript parquet drops."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def ingest_transcripts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "stream",
    **kwargs,
) -> StreamingQuery:
    """THE ingestion entry point. ``mode="stream"`` (default) runs the
    watermarked bounded-state dedup — the only shape that survives a
    long-lived stream; ``mode="backfill"`` runs the full-sink anti-join
    (exact forever, but each micro-batch re-reads the sink — reserve it
    for bounded catch-up loads)."""
    if mode == "stream":
        return stream_triples_watermarked(
            spark, input_dir, output_dir, checkpoint_dir, **kwargs
        )
    if mode == "backfill":
        return stream_triples(
            spark, input_dir, output_dir, checkpoint_dir, **kwargs
        )
    raise ValueError(f"mode must be 'stream' or 'backfill', got {mode!r}")


def stream_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """BACKFILL tier: per micro-batch, extract, then append only rows
    not already in the sink (anti-join dedup; MERGE INTO under an
    Iceberg catalog). Checkpointed → exactly-once files. Cost grows
    with sink size — long-lived streams use
    :func:`stream_triples_watermarked` (the :func:`ingest_transcripts`
    default).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # the storage layer picks MERGE INTO when an Iceberg catalog is
        # configured, anti-join-append on the parquet fallback — the
        # same upsert the batch path uses (storage.upsert_triples)
        from pyrdf2vec_spark.storage import upsert_triples

        upsert_triples(
            triples_only(extract_triples(batch_df)), "triples", output_dir
        )

    writer = (
        read_transcript_stream(spark, input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_triples_watermarked(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming-native dedup: ``withWatermark + dropDuplicates`` keeps
    the dedup STATE bounded by the watermark horizon instead of
    re-reading the whole sink per micro-batch (stream_triples' anti-join
    degrades linearly with sink size — fine for backfills, wrong for a
    long-lived stream). Duplicates arriving later than the watermark
    pass through; at rest the authoritative dedup is the Iceberg MERGE
    (or a periodic exact_dedup compaction) — the standard two-tier
    layout at 100 TB.

    Dedup key: (conv_id, turn_idx) — the per-turn identity the north
    rule orders by — BEFORE extraction, so re-delivered files don't even
    pay the extraction cost twice.

    Re-emission contract: a duplicate (conv_id, turn_idx) arriving MORE
    than ``watermark`` after the first occurrence is re-emitted (its
    dedup state was already evicted), so the append sink may contain
    duplicate triples beyond the watermark horizon. That is the
    bounded-state trade by design — the authoritative dedup is the
    at-rest tier (Iceberg MERGE / periodic exact_dedup compaction), and
    SparkKG's build-time dropDuplicates absorbs any residue entering
    the graph.
    """
    stream = read_transcript_stream(spark, input_dir)
    # dropDuplicatesWithinWatermark, NOT dropDuplicates: with a plain
    # dropDuplicates whose key subset excludes the event-time column,
    # Structured Streaming never evicts dedup state — it grows with
    # total distinct turns forever. The WithinWatermark variant expires
    # each key once the watermark passes its event time, which is the
    # bounded-state behavior this function promises.
    deduped = stream.withWatermark(
        "ts", watermark
    ).dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])

    def process(batch_df: DataFrame, batch_id: int) -> None:
        triples_only(extract_triples(batch_df)).write.mode(
            "append"
        ).parquet(output_dir)

    writer = (
        deduped.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def turn_rates(
    transcripts_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window turn counts per role — the
    late-data-tolerant monitoring aggregate (readStream → withWatermark
    → groupBy(window) per the Structured Streaming model)."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            "role",
            "n_turns",
        )
    )
