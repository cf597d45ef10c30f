"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship KG-construction query — deterministic synthetic
transcripts (BASELINE.json input_hint shape, synthesized at small scale;
no external data) -> mention detection -> windowed candidate pairs ->
batched CNN relation scoring -> deduplicated (subj, pred, obj) triples.

queries()/oracle_sql(): operator battery from SURVEY.md §2 over the
driver-provided tables, each with a DuckDB oracle; plus rows-only
entries for the non-SQL KG pipeline (see opennre_spark/plans/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opennre_spark.plans import queries as _plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0 and a stable schema."""
    from opennre_spark.pipeline import extract_triples
    from opennre_spark.sources.transcripts import transcripts_df

    transcripts = transcripts_df(spark, n_convs=60)
    return extract_triples(transcripts, mode="sentence")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _plans.queries()


def oracle_sql() -> dict[str, str]:
    return _plans.oracle_sql()
