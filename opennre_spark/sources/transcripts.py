"""Deterministic synthetic transcripts source (BASELINE.json input_hint:
`conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp`; FIXTURES.md F1).

Generation is a pure function of (conv_idx, seed): each conversation
derives its own `random.Random` stream, so the distributed generator
produces identical rows under any partitioning / parallelism level —
required for the local[8]-vs-local[32] scaling benchmark to run on
byte-identical input.

Skew is deliberate (north rule): conversation lengths are long-tailed
(1 in 41 conversations is ~15x longer) and the first few gazetteer
entities are Zipf-hot so the (h_id, t_id) bag aggregation sees hot keys.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import relations

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

_BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)
_ROLES = ["user", "assistant", "tool"]


def _pools():
    gaz = relations.gazetteer()
    by_kind = {"P": [], "O": [], "L": []}
    for eid, name, canon in gaz:
        by_kind[eid[0]].append((eid, name, canon))
    return by_kind


_BY_KIND = _pools()


def _pick(rng: random.Random, pool: list):
    # quadratic bias toward low indices -> hot entities (skew fixture)
    i = int((rng.random() ** 2) * len(pool))
    return pool[min(i, len(pool) - 1)]


def generate_conversation(conv_idx: int, seed: int = 42):
    """Rows + gold annotations for one conversation.

    Returns (rows, golds):
      rows:  list of (conv_id, turn_idx, role, text, tool, ts)
      golds: list of (conv_id, turn_idx, h_id, h_canon, relation,
             t_id, t_canon) for positive-template turns (relation != NA
             gold facts by construction; data_loader.py:156-164 facts-set
             semantics apply downstream as distinct (subj, pred, obj)).
    """
    rng = random.Random((seed << 32) ^ conv_idx)
    conv_id = f"conv{conv_idx:07d}"
    n_turns = 4 + (conv_idx % 9)
    if conv_idx % 41 == 0:
        n_turns = 60 + (conv_idx % 17)  # long-conversation skew
    rows = []
    golds = []
    for turn_idx in range(n_turns):
        role = _ROLES[turn_idx % 3]
        tool = "search" if role == "tool" else None
        r = rng.random()
        if r < 0.55:
            rel, hk, tk, tpl = relations.POSITIVE_TEMPLATES[
                rng.randrange(len(relations.POSITIVE_TEMPLATES))
            ]
            h = _pick(rng, _BY_KIND[hk])
            t = _pick(rng, _BY_KIND[tk])
            while t[0] == h[0]:
                t = _pick(rng, _BY_KIND[tk])
            text = tpl.replace("{h}", h[1]).replace("{t}", t[1])
            golds.append((conv_id, turn_idx, h[0], h[2], rel, t[0], t[2]))
        elif r < 0.70:
            hk, tk, tpl = relations.NEGATIVE_TEMPLATES[
                rng.randrange(len(relations.NEGATIVE_TEMPLATES))
            ]
            h = _pick(rng, _BY_KIND[hk])
            t = _pick(rng, _BY_KIND[tk])
            while t[0] == h[0]:
                t = _pick(rng, _BY_KIND[tk])
            text = tpl.replace("{h}", h[1]).replace("{t}", t[1])
        else:
            tpl = relations.FILLER_TEMPLATES[
                rng.randrange(len(relations.FILLER_TEMPLATES))
            ]
            if "{h}" in tpl:
                h = _pick(rng, _BY_KIND["P"])
                text = tpl.replace("{h}", h[1])
            else:
                text = tpl
        ts = _BASE_TS + dt.timedelta(hours=conv_idx % 10000, seconds=30 * turn_idx)
        rows.append((conv_id, turn_idx, role, text, tool, ts))
    return rows, golds


def transcripts_df(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic transcripts table.

    spark.range drives the fan-out; each task generates only its own
    conversations (no driver-side materialization — scales to any
    n_convs). At 100 TB this would be replaced by
    spark.read.table('transcripts') over Iceberg with identical schema.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_idx in pdf["id"]:
                rows, _ = generate_conversation(int(conv_idx), seed)
                out.extend(rows)
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
                )

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


GOLD_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("h_id", T.StringType(), False),
    T.StructField("subj", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("t_id", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
])


def gold_df(spark: SparkSession, n_convs: int, seed: int = 42) -> DataFrame:
    """Gold (subj, pred, obj) annotations (canonical ids), same generator."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_idx in pdf["id"]:
                _, golds = generate_conversation(int(conv_idx), seed)
                for conv_id, turn_idx, h_id, h_c, rel, t_id, t_c in golds:
                    out.append((conv_id, turn_idx, h_id, h_c, rel, t_id, t_c))
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in GOLD_SCHEMA])

    return spark.range(0, n_convs, numPartitions=8).mapInPandas(
        gen, schema=GOLD_SCHEMA
    )


def entities_df(spark: SparkSession) -> DataFrame:
    """Gazetteer dimension (FIXTURES.md F2) — small, broadcast-joinable."""
    return spark.createDataFrame(
        relations.gazetteer(), schema="entity_id string, name string, canonical_id string"
    )
