"""OpenNRE instance-file source (SURVEY.md §2.1 S1, FIXTURES.md F4).

The reference loads datasets as one python-dict-per-line text files
parsed with `eval(line)` (!) — data_loader.py:24-31. This source reads
the same shape safely: JSON lines with an explicit StructType (never
eval), producing the canonical instance columns the scoring operator
consumes. Blank lines are skipped (P2, data_loader.py:28-30).

Instance line shape (base_encoder.py:84-98 field contract):
  {"text": "...", "h": {"id": "...", "name": "...", "pos": [s, e]},
   "t": {...}, "relation": "..."}
or pre-tokenized: {"token": ["..."], ...} with token-index positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENTITY_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("pos", T.ArrayType(T.IntegerType()), True),
])

INSTANCE_SCHEMA = T.StructType([
    T.StructField("text", T.StringType(), True),
    T.StructField("token", T.ArrayType(T.StringType()), True),
    T.StructField("h", ENTITY_SCHEMA, True),
    T.StructField("t", ENTITY_SCHEMA, True),
    T.StructField("relation", T.StringType(), True),
    T.StructField("anno_relation_list", T.ArrayType(T.StringType()), True),
])


def read_instances(spark: SparkSession, path: str) -> DataFrame:
    """Instance file -> flat scoring-ready columns. Pre-tokenized rows
    ('token' instead of 'text') are joined with single spaces and their
    token-index positions converted to char offsets — tokenization of
    a space-joined token list splits back to the same tokens, so the
    encoder sees identical token sequences (utils.py:97-104 semantics).
    """
    raw = (
        spark.read.text(path)
        .filter(F.length(F.trim(F.col("value"))) > 0)  # P2
        .select(F.from_json("value", INSTANCE_SCHEMA).alias("i"))
        .select("i.*")
        # unparseable lines come back as an all-null struct — drop them
        # (the reference's eval() would raise instead; we skip + count
        # upstream via input minus output rows)
        .filter(F.col("text").isNotNull() | F.col("token").isNotNull())
    )

    # char offsets for pre-tokenized rows: start = sum(len+1) of tokens
    # before pos[0]; end = start + joined length of tokens[pos0:pos1]
    def char_range(ent):
        tok = F.col("token")
        p0 = F.col(f"{ent}.pos")[0]
        p1 = F.col(f"{ent}.pos")[1]
        before = F.when(
            p0 > 0,
            F.length(F.concat_ws(" ", F.slice(tok, 1, p0))) + 1,
        ).otherwise(F.lit(0))
        span = F.length(F.concat_ws(" ", F.slice(tok, p0 + 1, p1 - p0)))
        return before.cast("int"), (before + span).cast("int")

    has_text = F.col("text").isNotNull()
    hb_tok, he_tok = char_range("h")
    tb_tok, te_tok = char_range("t")
    return raw.select(
        F.when(has_text, F.col("text"))
        .otherwise(F.concat_ws(" ", F.col("token")))
        .alias("text"),
        F.col("h.id").alias("h_id"),
        F.col("h.name").alias("h_name"),
        F.when(has_text, F.col("h.pos")[0]).otherwise(hb_tok).alias("h_begin"),
        F.when(has_text, F.col("h.pos")[1]).otherwise(he_tok).alias("h_end"),
        F.col("t.id").alias("t_id"),
        F.col("t.name").alias("t_name"),
        F.when(has_text, F.col("t.pos")[0]).otherwise(tb_tok).alias("t_begin"),
        F.when(has_text, F.col("t.pos")[1]).otherwise(te_tok).alias("t_end"),
        F.col("relation"),
        F.col("anno_relation_list"),
    )
