"""r7 optimization internals: hof_let binding semantics and the
vectorized winnowing kernel's boundary rules (the operators it rewrote
are oracle-checked end to end; these pin the edge cases and the helper
contract directly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opennre_spark.operators.hof import hof_let


def test_hof_let_value_identity(spark):
    """hof_let(expr, fn) must equal fn applied to the inlined expr —
    including nested bindings."""
    df = spark.range(0, 100).select(
        F.split(F.concat(F.lit("a b c d e f "), F.col("id").cast("string")), " ").alias(
            "toks"
        )
    )
    direct = df.select(
        F.array_min(
            F.transform(F.col("toks"), lambda s: F.pmod(F.xxhash64(s), F.lit(2**31)))
        ).alias("m")
    ).collect()
    bound = df.select(
        hof_let(
            F.transform(F.col("toks"), lambda s: F.pmod(F.xxhash64(s), F.lit(2**31))),
            lambda hv: F.array_min(hv),
        ).alias("m")
    ).collect()
    nested = df.select(
        hof_let(
            F.col("toks"),
            lambda tv: hof_let(
                F.transform(tv, lambda s: F.pmod(F.xxhash64(s), F.lit(2**31))),
                lambda hv: F.array_min(hv),
            ),
        ).alias("m")
    ).collect()
    assert [r.m for r in direct] == [r.m for r in bound] == [r.m for r in nested]


def _winnow_reference(text: str, k: int = 4, window: int = 4, base: int = 257):
    """Loop rendition of the pre-r7 HOF expression pipeline (the
    documented winnowing boundary rules)."""
    import re

    t = re.sub(" +", " ", re.sub("[^a-z0-9 ]", "", text.lower())).strip()
    if len(t) < k:
        return set()
    codes = [ord(ch) for ch in t]
    grams = []
    for p in range(len(t) - k + 1):
        e = 0
        for i in range(k):
            e = e * base + codes[p + i]
        grams.append(e)
    if len(grams) >= window:
        return {min(grams[i : i + window]) for i in range(len(grams) - window + 1)}
    return {min(grams)}


@pytest.mark.parametrize(
    "text",
    [
        "",                    # empty -> no fingerprints
        "ab",                  # shorter than k -> none
        "abcd",                # exactly k chars -> one gram -> one fp
        "abcdef",              # k <= L, G < window -> single global min
        "abcdefg",             # G == window -> one window
        "The quick brown fox jumps over the lazy dog!!",
        "a  b   c    d     e",  # space collapsing
        "ABC!!!def???ghi 123",   # normalization strips + lowers
    ],
)
def test_winnow_boundary_rules(spark, text):
    from opennre_spark.operators.textstats import winnow_fingerprints

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.fp for r in winnow_fingerprints(docs).collect()}
    assert got == _winnow_reference(text)
