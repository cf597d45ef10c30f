"""Entity-pair candidate generation (SURVEY.md §2.3 J3).

The reference receives (sentence, h, t) pairs pre-built in its datasets
(data_loader.py:160-168 just reads item['h']/['t']); a KG pipeline over
raw transcripts must generate them. Semantics: two mentions form a
directed candidate if they occur in the same conversation within
PAIR_WINDOW_TURNS turns of each other and refer to different entities.

 - same-turn pair: instance text is the turn text, spans as detected —
   byte-for-byte the reference's single-sentence contract
   (base_encoder.py:91-98), preserving the per-turn text-equality
   invariant (BASELINE.json input_hint); both directions arise from the
   join's own symmetry;
 - cross-turn pair: instance text is earlier_text + ' ' + later_text,
   later-turn span offset by len(earlier)+1; both directions built
   explicitly (the join only keeps turn_a <= turn_b).

Physical plan: ONE shuffle — a self-equi-join on conv_id with the turn
window as a residual range predicate, then a narrow explode for the
direction fan-out (the join output is never recomputed). Conversations
are bounded and the window caps fan-out, so output is linear in
mentions; hot conversations are split by AQE skew-join
(spark.sql.adaptive.skewJoin.enabled, see session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config

INSTANCE_COLS = [
    "conv_id", "turn_idx", "pair_turn_idx", "text",
    "h_id", "h_name", "h_begin", "h_end",
    "t_id", "t_name", "t_begin", "t_end",
]


def candidate_pairs(
    mentions: DataFrame,
    window_turns: int = config.PAIR_WINDOW_TURNS,
    repartition: int | None = None,
) -> DataFrame:
    """mentions -> directed instance rows (one per candidate pair).

    repartition: round-robin repartition the JOINED rows BEFORE the
    direction explode (r7). The scoring stage pins its parallelism with
    a repartition anyway (see pipeline.py); doing it pre-explode keeps
    a cross-turn pair's two directed instances ADJACENT in one
    partition — they tokenize to the same id sequence (the encoder
    order-normalizes spans), so the encode kernel's per-batch memo pays
    the per-row string work once per pair instead of once per
    direction. A post-explode round-robin would send the twins to
    different partitions."""
    a = mentions.alias("a")
    b = mentions.alias("b")
    ac, bc = (lambda c: F.col(f"a.{c}")), (lambda c: F.col(f"b.{c}"))

    joined = a.join(
        b,
        (ac("conv_id") == bc("conv_id"))
        & (bc("turn_idx") >= ac("turn_idx"))
        & (bc("turn_idx") - ac("turn_idx") <= window_turns)
        & (ac("entity_id") != bc("entity_id"))
        & ~((ac("turn_idx") == bc("turn_idx")) & (ac("begin") == bc("begin"))),
        "inner",
    )

    if repartition is not None:
        joined = joined.repartition(repartition)

    same_turn = ac("turn_idx") == bc("turn_idx")
    off = F.length(ac("text")) + F.lit(1)

    def directed(h, t, h_off, t_off):
        """struct<h_id,h_name,h_begin,h_end,t_id,t_name,t_begin,t_end>"""
        hb = (F.col(f"{h}.begin") + h_off).cast("int")
        he = (F.col(f"{h}.end") + h_off).cast("int")
        tb = (F.col(f"{t}.begin") + t_off).cast("int")
        te = (F.col(f"{t}.end") + t_off).cast("int")
        return F.struct(
            F.col(f"{h}.entity_id").alias("h_id"),
            F.col(f"{h}.name").alias("h_name"),
            hb.alias("h_begin"),
            he.alias("h_end"),
            F.col(f"{t}.entity_id").alias("t_id"),
            F.col(f"{t}.name").alias("t_name"),
            tb.alias("t_begin"),
            te.alias("t_end"),
        )

    zero = F.lit(0)
    variants = F.when(
        same_turn,
        F.array(directed("a", "b", zero, zero)),
    ).otherwise(
        F.array(directed("a", "b", zero, off), directed("b", "a", off, zero))
    )

    exploded = joined.select(
        ac("conv_id").alias("conv_id"),
        ac("turn_idx").alias("turn_idx"),
        bc("turn_idx").alias("pair_turn_idx"),
        F.when(same_turn, ac("text"))
        .otherwise(F.concat_ws(" ", ac("text"), bc("text")))
        .alias("text"),
        F.explode(variants).alias("d"),
    )
    return exploded.select(
        "conv_id", "turn_idx", "pair_turn_idx", "text", "d.*"
    )
