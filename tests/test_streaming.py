"""Structured Streaming ingestion: exactly-once incremental file
processing via checkpoint + availableNow, and the watermarked windowed
aggregation shape."""

import os

import pytest

from opennre_spark.sources.transcripts import transcripts_df
from opennre_spark.streaming.ingest import (
    kg_view,
    mention_rate,
    read_transcript_stream,
    stream_extract_triples,
)


def test_incremental_stream_extract(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # first file arrives
    transcripts_df(spark, 10).coalesce(1).write.mode("append").parquet(inp)
    n1 = stream_extract_triples(spark, inp, out, ckpt)
    assert n1 >= 1
    first = kg_view(spark, out).count()
    assert first > 0

    # no new files -> zero batches processed (exactly-once tracking)
    n2 = stream_extract_triples(spark, inp, out, ckpt)
    assert n2 == 0
    assert kg_view(spark, out).count() == first

    # second file arrives (different conversations) -> only it is processed
    t2 = transcripts_df(spark, 22).filter("conv_id >= 'conv0000010'")
    t2.coalesce(1).write.mode("append").parquet(inp)
    n3 = stream_extract_triples(spark, inp, out, ckpt)
    assert n3 >= 1
    combined = kg_view(spark, out)
    assert combined.count() >= first

    # streamed KG == batch KG over the union of both file sets
    batch = spark.read.parquet(inp)
    from opennre_spark.pipeline import extract_triples

    want = {
        (r.subj, r.pred, r.obj)
        for r in extract_triples(batch, mode="sentence").collect()
    }
    got = {(r.subj, r.pred, r.obj) for r in combined.collect()}
    assert got == want


def test_mention_rate_windowed(spark, tmp_path):
    inp = str(tmp_path / "in2")
    transcripts_df(spark, 12).coalesce(1).write.mode("append").parquet(inp)
    stream = read_transcript_stream(spark, inp)
    q = (
        mention_rate(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from rates").collect()
    # append mode emits only watermark-closed windows; with a bounded
    # availableNow drain the final windows stay open -> completeness is
    # asserted on the closed prefix
    batch = spark.read.parquet(inp)
    from pyspark.sql import functions as F

    want = {
        (r.window_start, r.role): r.n_turns
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "role"
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns")
        .collect()
    }
    assert rows, "expected at least one closed window"
    for r in rows:
        assert want[(r.window_start, r.role)] == r.n_turns


def test_conversation_sessions(spark, tmp_path):
    """Session windows close per conversation after the gap; closed
    sessions must match the batch session_window aggregation on the
    same files (the streaming/batch unification contract)."""
    from opennre_spark.streaming.ingest import conversation_sessions

    inp = str(tmp_path / "in_sess")
    transcripts_df(spark, 12).coalesce(1).write.mode("append").parquet(inp)
    stream = read_transcript_stream(spark, inp)
    q = (
        conversation_sessions(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from sessions").collect()
    assert rows, "expected at least one closed session"
    from pyspark.sql import functions as F

    batch = spark.read.parquet(inp)
    want = {
        (r.conv_id, r.session_start): (r.n_turns, r.first_turn_idx, r.last_turn_idx)
        for r in batch.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "conv_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn_idx"),
            F.max("turn_idx").alias("last_turn_idx"),
        )
        .select(
            "conv_id", F.col("w.start").alias("session_start"),
            "n_turns", "first_turn_idx", "last_turn_idx",
        )
        .collect()
    }
    for r in rows:
        assert want[(r.conv_id, r.session_start)] == (
            r.n_turns, r.first_turn_idx, r.last_turn_idx
        ), r.conv_id


def test_bounded_complete_sessions_equal_batch_and_gap_rule(spark, tmp_path):
    """The driver's streaming_sessions battery query runs the session
    operator bounded in COMPLETE mode. Two contracts, hermetically:
    (1) that run emits EXACTLY the batch session_window set — append
    mode holds back sessions inside the final watermark, complete does
    not, which is why the bounded replay uses it; (2) the set equals
    the relational gap rule the DuckDB oracle implements (new session
    iff the gap to the previous event is >= the 30-minute timeout —
    Spark's [ts, ts+gap) windows merge only on strict overlap)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from opennre_spark.streaming.ingest import (
        conversation_sessions,
        read_transcript_stream,
    )

    inp = str(tmp_path / "in_sess_complete")
    transcripts_df(spark, 12).coalesce(1).write.mode("append").parquet(inp)
    stream = read_transcript_stream(spark, inp)
    q = (
        conversation_sessions(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.conv_id, r.start_us, r.end_us, r.n_turns)
        for r in spark.table("sessions_complete")
        .select(
            "conv_id",
            F.unix_micros(F.col("session_start").cast("timestamp")).alias(
                "start_us"
            ),
            F.unix_micros(F.col("session_end").cast("timestamp")).alias(
                "end_us"
            ),
            "n_turns",
        )
        .collect()
    }

    batch = spark.read.parquet(inp)
    want_batch = {
        (r.conv_id, r.start_us, r.end_us, r.n_turns)
        for r in batch.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
            .alias("w"),
            "conv_id",
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_turns",
        )
        .collect()
    }
    assert got == want_batch and got

    # the relational gap rule (the DuckDB oracle's logic, in Spark)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gap_us = 30 * 60 * 1_000_000
    sess = (
        batch.withColumn("us", us)
        .withColumn(
            "new_sess",
            (F.col("us") - F.lag("us").over(w) >= F.lit(gap_us)).cast("int"),
        )
        .withColumn(
            "sess_no",
            F.sum(F.coalesce("new_sess", F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("conv_id", "sess_no")
        .agg(
            F.min("us").alias("start_us"),
            (F.max("us") + F.lit(gap_us)).alias("end_us"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
    want_gap = {
        (r.conv_id, r.start_us, r.end_us, r.n_turns)
        for r in sess.collect()
    }
    assert got == want_gap


def test_bounded_append_sessions_equal_watermark_closed_prefix(spark, tmp_path):
    """The driver's streaming_sessions_append battery query runs the
    PRODUCTION emit-on-watermark path bounded. Contract (the DuckDB
    oracle's rule): the emitted set is exactly the gap sessions whose
    window end precedes the final watermark max(ts) - delay — the
    closing no-data micro-batch flushes every watermark-closed session
    regardless of how the file source batched the input, and the
    in-watermark tail is held back (append semantics), not lost."""
    from pyspark.sql import functions as F

    from opennre_spark.streaming.ingest import (
        conversation_sessions,
        read_transcript_stream,
    )

    inp = str(tmp_path / "in_sess_append")
    transcripts_df(spark, 12).coalesce(1).write.mode("append").parquet(inp)
    stream = read_transcript_stream(spark, inp)
    q = (
        conversation_sessions(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sessions_append_prefix")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.conv_id, r.start_us, r.end_us, r.n_turns)
        for r in spark.table("sessions_append_prefix")
        .select(
            "conv_id",
            F.unix_micros(F.col("session_start").cast("timestamp")).alias(
                "start_us"
            ),
            F.unix_micros(F.col("session_end").cast("timestamp")).alias(
                "end_us"
            ),
            "n_turns",
        )
        .collect()
    }

    batch = spark.read.parquet(inp)
    max_us = batch.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
    ).first()[0]
    watermark_us = max_us - 2 * 3600 * 1_000_000
    all_sessions = {
        (r.conv_id, r.start_us, r.end_us, r.n_turns)
        for r in batch.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
            .alias("w"),
            "conv_id",
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_turns",
        )
        .collect()
    }
    want = {s for s in all_sessions if s[2] < watermark_us}
    assert got == want
    # the test is only meaningful if the watermark actually splits the
    # session set: some emitted, some held back
    assert got and len(got) < len(all_sessions)


def test_stateful_conversation_tracker(spark, tmp_path):
    """applyInPandasWithState: per-conv state accumulates ACROSS
    micro-batches (two files, overlapping conversations)."""
    from opennre_spark.streaming.stateful import conversation_tracker

    from opennre_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    inp = str(tmp_path / "in3")
    ckpt = str(tmp_path / "ckpt3")
    full = transcripts_df(spark, 6)
    # split each conversation's turns across two files
    full.filter("turn_idx % 2 = 0").coalesce(1).write.mode("append").parquet(inp)
    full.filter("turn_idx % 2 = 1").coalesce(1).write.mode("append").parquet(inp)

    # one file per micro-batch so state must carry across batches
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        conversation_tracker(stream)
        .writeStream.format("memory")
        .queryName("convstate")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from convstate").collect()
    # the LAST emission per conversation must equal the batch totals
    # (state carried across micro-batches)
    want = {
        r.conv_id: (r.n, r.mx)
        for r in full.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    }
    last = {}
    for r in rows:
        last[r.conv_id] = (r.n_turns, r.max_turn_idx)  # later rows overwrite
    # rows arrive batch-ordered per group; max n_turns is the final state
    best = {}
    for r in rows:
        cur = best.get(r.conv_id)
        if cur is None or r.n_turns > cur[0]:
            best[r.conv_id] = (r.n_turns, r.max_turn_idx)
    assert best == want, (best, want)


from pyspark.sql import functions as F  # noqa: E402
