"""Mention detection over transcript turns.

The reference only *declares* an NER interface (base_model.py:59-71
`NER.ner` is abstract and never implemented; OpenNRE datasets ship with
entity spans pre-annotated). Our deterministic stand-in is a gazetteer
matcher: longest-match-first regex over the turn text, returning char
spans in the same [start, end) convention the reference instances use
(FIXTURES.md F4, base_encoder.py:97-98 `item['h']['pos']`).

Runs as mapInPandas (Arrow-batched, no per-row Python UDF): the compiled
regex is built once per executor process from the broadcast gazetteer.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MENTION_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("entity_id", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("begin", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
])

_REGEX_CACHE: dict[int, tuple] = {}


def _matcher(gazetteer: tuple):
    """Compile (and memoize per-process) the alternation regex.

    Names sorted longest-first so the scanner is greedy-longest at each
    start offset; \b-like boundaries via lookarounds that also treat
    '.' in abbreviated forms correctly.
    """
    key = hash(gazetteer)
    hit = _REGEX_CACHE.get(key)
    if hit is not None:
        return hit
    by_name = {}
    for eid, name, canon in gazetteer:
        by_name.setdefault(name, (eid, canon))
    names = sorted(by_name, key=len, reverse=True)
    pattern = re.compile(
        r"(?<![A-Za-z0-9])(" + "|".join(re.escape(n) for n in names) + r")(?![A-Za-z0-9])"
    )
    out = (pattern, by_name)
    _REGEX_CACHE[key] = out
    return out


def detect_mentions(transcripts: DataFrame, gazetteer: list) -> DataFrame:
    """transcripts -> one row per detected mention (text carried along
    for downstream instance construction). Narrow transformation: no
    shuffle; partitioning of the scan is preserved.
    """
    gaz = tuple(tuple(g) for g in gazetteer)

    def find(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pattern, by_name = _matcher(gaz)
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                for m in pattern.finditer(text):
                    name = m.group(1)
                    eid, _ = by_name[name]
                    rows.append(
                        (conv_id, int(turn_idx), text, eid, name, m.start(1), m.end(1))
                    )
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in MENTION_SCHEMA])

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        find, schema=MENTION_SCHEMA
    )
