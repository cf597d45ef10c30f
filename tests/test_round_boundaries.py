"""Boundary-distance guard for the 6-decimal rounded oracle columns
(VERDICT r5 nit #1 / next-round #6).

Order-sensitive accumulations (a10's AUC / max-F1 / macro averages,
w3's trapezoid AUC, embedding_centroid's avg) are rounded to 6 decimals
in BOTH engines before the driver's string-equality hash — a tolerance
encoded as string equality. That compare only stays stable while the
unrounded doubles (i) agree across engines far more tightly than
(ii) their distance to the nearest 6-decimal rounding boundary. These
tests assert exactly that, on the driver's own sf0.01 tables, so a
value drifting toward a boundary fails HERE before it can round apart
under the driver.

Deliberately NOT covered: w4_max_f1 and the unrounded a10 ratio
columns — they are elementwise-deterministic functions of integer
counts (correctly-rounded IEEE division, no accumulation-order
dependence), so both engines produce bit-identical doubles and no
boundary can split them.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _strip_round6(sql: str) -> str:
    """Remove round(expr, 6) wrappers. Every oracle text puts at most
    one round(..., 6) per line, so the greedy group spans the full
    argument expression on that line."""
    return "\n".join(
        re.sub(r"round\((.*), 6\)", r"(\1)", ln) for ln in sql.splitlines()
    )


def _duck():
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _boundary_margin(x: float) -> float:
    """Distance from x to the nearest 6-decimal rounding boundary
    (the .5 of the 6th decimal, where half-rounding flips)."""
    f = abs(x) * 1e6
    frac = f - math.floor(f)
    return abs(frac - 0.5) * 1e-6


def test_a10_rounded_metrics_unrounded_parity_and_boundary_margin(spark):
    """The five a10 columns both engines round to 6: the UNROUNDED
    Spark (numpy evaluator) and DuckDB (oracle SQL sans round) values
    must agree within 1e-9 and sit >= 1e-9 from a rounding boundary."""
    from opennre_spark import relations
    from opennre_spark.operators.metrics import multilabel_sentence_eval
    from opennre_spark.plans.queries import A10_SCHEMA, _a10_cells_sql, oracle_sql

    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView(
        "events"
    )
    cells = spark.sql(_a10_cells_sql())
    res = multilabel_sentence_eval(cells, relations.rel2id_for(A10_SCHEMA))
    spark_vals = {
        "auc": res["auc"],
        "max_micro_f1": res["max_micro_f1"],
        "macro_p": res["macro_p"],
        "macro_r": res["macro_r"],
        "macro_f1": res["macro_f1"],
    }

    cur = _duck().execute(_strip_round6(oracle_sql()["a10_multilabel_eval"]))
    cols = [d[0] for d in cur.description]
    duck_vals = dict(zip(cols, cur.fetchone()))

    for name, sv in spark_vals.items():
        dv = float(duck_vals[name])
        sv = float(sv)
        assert abs(sv - dv) <= 1e-9, (name, sv, dv)
        for eng, v in (("spark", sv), ("duck", dv)):
            assert _boundary_margin(v) >= 1e-9, (
                f"{name} ({eng}) = {v!r} sits within 1e-9 of a 6-decimal "
                "rounding boundary — the driver hash could round apart"
            )


def test_w3_auc_unrounded_parity_and_boundary_margin(spark):
    """w3's trapezoid AUC is an order-sensitive sum rounded in both
    engines; same guard, run on the SHARED SQL text with the round
    stripped (the Spark and DuckDB dialects of this query are the
    same string, so stripping once covers both)."""
    from opennre_spark.plans.queries import oracle_sql

    sql = _strip_round6(oracle_sql()["w3_auc"])
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView(
        "events"
    )
    sv = float(spark.sql(sql).first()["auc"])
    dv = float(_duck().execute(sql).fetchone()[0])
    assert abs(sv - dv) <= 1e-9, (sv, dv)
    for v in (sv, dv):
        assert _boundary_margin(v) >= 1e-9, v


def test_centroid_unrounded_parity_scaled_boundary_margin(spark):
    """embedding_centroid rounds 640 avg() values (order-sensitive
    partial aggregation in Spark). With 640 draws the NATURAL minimum
    distance to a 6-decimal boundary is ~1e-9 (spacing 1e-6 / 2 / 640),
    so a fixed 1e-9 floor would flag healthy values; the safety
    property is RELATIVE: each value's boundary margin must exceed
    1000x the measured cross-engine disagreement (floored at 1e-15,
    double-precision ulp scale)."""
    from opennre_spark.plans.queries import oracle_sql

    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    srows = spark.sql(
        """
        SELECT label, dim, avg(v) AS centroid_v
        FROM (
          SELECT label, posexplode(embedding) AS (dim, v) FROM embeddings
        ) t
        GROUP BY label, dim
        """
    ).collect()
    spark_vals = {(r.label, r.dim): float(r.centroid_v) for r in srows}

    drows = _duck().execute(
        _strip_round6(oracle_sql()["embedding_centroid"])
    ).fetchall()
    duck_vals = {(r[0], r[1]): float(r[2]) for r in drows}

    assert spark_vals.keys() == duck_vals.keys()
    assert len(spark_vals) >= 500
    for key, sv in spark_vals.items():
        dv = duck_vals[key]
        diff = max(abs(sv - dv), 1e-15)
        assert diff <= 1e-9, (key, sv, dv)
        for v in (sv, dv):
            assert _boundary_margin(v) >= 1000.0 * diff, (
                key, v, diff, _boundary_margin(v)
            )
