"""Metric-suite parity vs the loop oracle on a seeded fixture
(FIXTURES.md F6: >= 300 ranked predictions so P@300 is defined, >= 20
gold facts). Covers W1-W5 (curve, AUC, max-F1, P@k) and A9-A11."""

import random

import pytest

from opennre_spark import relations
from opennre_spark.operators.metrics import bag_eval, pr_curve, sentence_eval
from tests.oracle import reference_math as om

REL_NAMES = [r for r in relations.REL2ID if r != "NA"]


@pytest.fixture(scope="module")
def fixture():
    rng = random.Random(7)
    pairs = [(f"H{i:03d}", f"T{i % 37:03d}") for i in range(60)]
    facts = set()
    while len(facts) < 25:
        h, t = pairs[rng.randrange(len(pairs))]
        facts.add((h, t, REL_NAMES[rng.randrange(len(REL_NAMES))]))
    preds = []
    for h, t in pairs:
        for r in REL_NAMES:
            # scores biased so facts rank high but with noise
            base = 0.65 if (h, t, r) in facts else 0.25
            preds.append(
                {
                    "entpair": (h, t),
                    "relation": r,
                    "score": round(min(0.999, max(0.001, rng.gauss(base, 0.18))), 6),
                }
            )
    assert len(preds) >= 300
    return preds, facts


@pytest.fixture(scope="module")
def spark_dfs(spark, fixture):
    preds, facts = fixture
    pred_df = spark.createDataFrame(
        [(p["entpair"][0], p["entpair"][1], p["relation"], p["score"]) for p in preds],
        "h_id string, t_id string, relation string, score double",
    )
    facts_df = spark.createDataFrame(
        sorted(facts), "h_id string, t_id string, relation string"
    )
    return pred_df, facts_df


def test_pr_curve_parity(spark_dfs, fixture):
    preds, facts = fixture
    curve = {
        r["rank"]: (r["prec"], r["rec"])
        for r in pr_curve(*spark_dfs).select("rank", "prec", "rec").collect()
    }
    want = om.oracle_bag_eval(preds, facts, relations.REL2ID)
    for i, (p, r) in enumerate(zip(want["prec"], want["rec"])):
        got_p, got_r = curve[i + 1]
        assert abs(got_p - p) < 1e-12 and abs(got_r - r) < 1e-12, i


def test_ranked_cumsum_quantile_buckets(spark_dfs):
    """buckets='quantile' must produce IDENTICAL ranks/cumsums to
    'uniform' (the bucketing only relocates partition boundaries) while
    evening the per-bucket row spread on skewed scores."""
    from pyspark.sql import functions as F

    from opennre_spark.operators.metrics import ranked_cumsum

    pred_df, facts_df = spark_dfs
    marked = pred_df.join(
        F.broadcast(facts_df.withColumn("is_correct", F.lit(1))),
        ["h_id", "t_id", "relation"],
        "left",
    ).withColumn("is_correct", F.coalesce("is_correct", F.lit(0)))
    uni = {
        (r.h_id, r.t_id, r.relation): (r["rank"], r.cum_correct)
        for r in ranked_cumsum(marked, buckets="uniform").collect()
    }
    qua = {
        (r.h_id, r.t_id, r.relation): (r["rank"], r.cum_correct)
        for r in ranked_cumsum(marked, buckets="quantile").collect()
    }
    assert uni == qua
    assert len(uni) == marked.count()

    # the shape that crashed in review: a plain in-memory DataFrame
    # (no upstream join), quantile mode — the bucket expression becomes
    # the broadcast-join key and must still bind (Spark 4.1.2
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND regression guard)
    spark = pred_df.sparkSession
    plain = spark.createDataFrame(
        [(i, float((i * 37) % 100) / 100.0, i % 2) for i in range(500)],
        "event_id long, score double, is_correct int",
    )
    got = ranked_cumsum(plain, tiebreak=("event_id",), buckets="quantile").collect()
    assert sorted(r["rank"] for r in got) == list(range(1, 501))

    # NULL scores rank last (DESC NULLS LAST semantics), no crash
    withnull = spark.createDataFrame(
        [(1, 1.0, 1), (2, None, 0), (3, 0.5, 1)],
        "event_id long, score double, is_correct int",
    )
    rows = {r.event_id: r["rank"] for r in ranked_cumsum(withnull, tiebreak=("event_id",)).collect()}
    assert rows == {1: 1, 3: 2, 2: 3}


def test_ranked_cumsum_property(spark):
    """Property check of the distributed prefix sum against a plain
    python sort: heavy ties, negative scores, constant scores, skewed
    clusters — every distribution must produce the exact global rank
    and running sum in both bucket modes."""
    from pyspark.sql import functions as F  # noqa: F401

    from opennre_spark.operators.metrics import ranked_cumsum

    rng = random.Random(23)
    cases = []
    # heavy ties on few distinct values
    cases.append([(i, float(rng.choice([0.1, 0.5, 0.9])), rng.randint(0, 1)) for i in range(300)])
    # negative + positive, wide range
    cases.append([(i, rng.uniform(-50.0, 50.0), rng.randint(0, 1)) for i in range(300)])
    # all-equal scores (single bucket, pure tiebreak ordering)
    cases.append([(i, 0.25, i % 3 == 0) for i in range(100)])
    # exponential skew (most mass in one bucket)
    cases.append([(i, rng.expovariate(5.0), rng.randint(0, 1)) for i in range(400)])
    for data in cases:
        data = [(i, s, int(f)) for i, s, f in data]
        df = spark.createDataFrame(data, "event_id long, score double, is_correct int")
        expect = {}
        cum = 0
        for rank, (i, s, f) in enumerate(
            sorted(data, key=lambda r: (-r[1], r[0])), start=1
        ):
            cum += f
            expect[i] = (rank, cum)
        for mode in ("uniform", "quantile"):
            got = {
                r.event_id: (r["rank"], r.cum_correct)
                for r in ranked_cumsum(df, tiebreak=("event_id",), buckets=mode).collect()
            }
            assert got == expect, mode


def test_bag_eval_parity(spark_dfs, fixture):
    preds, facts = fixture
    got = bag_eval(*spark_dfs, rel_count=len(relations.REL2ID))
    want = om.oracle_bag_eval(preds, facts, relations.REL2ID)
    assert abs(got["auc"] - want["auc"]) < 1e-9
    assert abs(got["max_micro_f1"] - want["max_micro_f1"]) < 1e-12
    assert abs(got["mean_prec"] - want["mean_prec"]) < 1e-12
    assert got["best_threshold"] == pytest.approx(want["best_threshold"], abs=1e-12)
    for k in ("p@100", "p@200", "p@300"):
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    ml = om.oracle_entpair_f1(preds, facts, relations.REL2ID)
    assert got["micro_p"] == pytest.approx(ml["micro_p"], abs=1e-12)
    assert got["micro_r"] == pytest.approx(ml["micro_r"], abs=1e-12)
    assert got["micro_f1"] == pytest.approx(ml["micro_f1"], abs=1e-12)
    assert got["macro_f1"] == pytest.approx(ml["macro_f1"], abs=1e-12)


def test_sentence_eval_parity(spark):
    rng = random.Random(11)
    names = list(relations.REL2ID)
    rows = [
        (names[rng.randrange(len(names))], names[rng.randrange(len(names))])
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "gold string, pred string")
    got = sentence_eval(df, relations.REL2ID)
    g = [relations.REL2ID[a] for a, _ in rows]
    p = [relations.REL2ID[b] for _, b in rows]
    want = om.oracle_sentence_eval(g, p, relations.REL2ID)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
