"""Mention detection over transcript turns.

The reference only *declares* an NER interface (base_model.py:59-71
`NER.ner` is abstract and never implemented; OpenNRE datasets ship with
entity spans pre-annotated). Our deterministic stand-in is a gazetteer
matcher: longest-match-first regex over the turn text, returning char
spans in the same [start, end) convention the reference instances use
(FIXTURES.md F4, base_encoder.py:97-98 `item['h']['pos']`).

Runs as mapInArrow (Arrow-batched, no per-row Python UDF): the compiled
regex is built once per executor process from the broadcast gazetteer.
Only the match positions are Python; the carried-along columns
(conv_id, turn_idx, text) fan out to one-row-per-mention via an Arrow
take() gather on the input buffers, so the (possibly long) turn text is
never re-encoded through Python objects on the way out.
"""

from __future__ import annotations

import re
from typing import Iterator

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

    def find(batches: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        pattern, by_name = _matcher(gaz)
        for rb in batches:
            texts = rb.column("text").to_pylist()
            ridx: list[int] = []
            eids: list[str] = []
            names: list[str] = []
            begins: list[int] = []
            ends: list[int] = []
            for i, text in enumerate(texts):
                for m in pattern.finditer(text):
                    name = m.group(1)
                    ridx.append(i)
                    eids.append(by_name[name][0])
                    names.append(name)
                    begins.append(m.start(1))
                    ends.append(m.end(1))
            if not ridx:
                continue
            take = pa.array(ridx, type=pa.int32())
            # ADVICE r6: cast the forwarded input columns to the declared
            # MENTION_SCHEMA Arrow types — the old mapInPandas path
            # silently coerced (e.g. a bigint turn_idx), the raw forward
            # raised an Arrow schema mismatch instead; pc.cast restores
            # the input tolerance (no-op when types already match)
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(pc.take(rb.column("conv_id"), take), pa.string()),
                    pc.cast(pc.take(rb.column("turn_idx"), take), pa.int32()),
                    pc.cast(pc.take(rb.column("text"), take), pa.string()),
                    pa.array(eids, type=pa.string()),
                    pa.array(names, type=pa.string()),
                    pa.array(begins, type=pa.int32()),
                    pa.array(ends, type=pa.int32()),
                ],
                names=[f.name for f in MENTION_SCHEMA],
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInArrow(
        find, schema=MENTION_SCHEMA
    )
