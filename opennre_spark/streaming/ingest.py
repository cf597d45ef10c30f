"""Structured Streaming ingestion (SURVEY.md §2.9: the reference is
pure batch; this is the Spark-native streaming mode layered on the same
operators).

Two shapes:
  - `stream_extract_triples`: incremental file-source ingestion with
    exactly-once file tracking (checkpointLocation) and
    Trigger.AvailableNow — each invocation drains only files that
    arrived since the last run, pushes each micro-batch through the
    *batch* extract_triples plan via foreachBatch, and appends triples.
    Downstream consumers dedupe on (subj, pred, obj) (the facts-set
    semantics, data_loader.py:156-164) — append-only triples are
    lineage, the KG view is the distinct.
  - `mention_rate`: a watermarked tumbling-window aggregation over the
    transcript stream (late turns tolerated up to the watermark) —
    the canonical stateful-op shape for monitoring ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )


def stream_extract_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "sentence",
) -> int:
    """Drain all currently-available new files; returns the number of
    micro-batches processed. Safe to call repeatedly — the checkpoint
    guarantees each input file is processed exactly once.
    """
    from ..pipeline import extract_triples

    stream = read_transcript_stream(spark, input_dir)
    n_batches = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples = extract_triples(batch_df, mode=mode)
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(os.path.join(output_dir, "triples"))
        )
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def kg_view(spark: SparkSession, output_dir: str) -> DataFrame:
    """The deduplicated KG over the append-only streamed triples."""
    t = spark.read.parquet(os.path.join(output_dir, "triples"))
    return t.groupBy("subj", "pred", "obj").agg(
        F.max("score").alias("score"), F.sum("n_support").alias("n_support")
    )


def mention_rate(
    transcripts_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window turn counts per role — the streaming
    aggregation shape (append output mode compatible)."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )


def conversation_sessions(
    transcripts_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time session windows per conversation (SURVEY.md §2.9:
    sessions are the natural streaming model for conversations — a
    session closes when no turn arrives for `gap`). Built on Spark's
    native session_window: state is merged incrementally per key and
    emitted once the watermark passes the session end, so per-key state
    stays bounded regardless of stream length.

    Returns one row per closed session: (conv_id, session_start,
    session_end, n_turns, n_roles, first_turn_idx, last_turn_idx).
    """
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            # countDistinct is unsupported on streaming aggregations;
            # an exact set-size via collect_set is (roles are few)
            F.size(F.collect_set("role")).alias("n_roles"),
            F.min("turn_idx").alias("first_turn_idx"),
            F.max("turn_idx").alias("last_turn_idx"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_turns", "n_roles", "first_turn_idx", "last_turn_idx",
        )
    )
