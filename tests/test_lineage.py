"""Resume-after-kill semantics (BASELINE.md targets: 'resume-after-kill
test in pytest'): a run that stops after k buckets, resumed, must land
byte-identical triples to a single-shot run; completed buckets are
never re-processed."""

import shutil

import pytest
from pyspark.sql import functions as F

from opennre_spark import lineage
from opennre_spark.sources.transcripts import transcripts_df

N_CONVS = 24
N_BUCKETS = 4


@pytest.fixture()
def transcripts(spark):
    return transcripts_df(spark, N_CONVS)


def _collect_triples(spark, out_dir):
    return sorted(
        (r.subj, r.pred, r.obj, round(r.score, 6), r.n_support, r.bucket)
        for r in lineage.read_triples(spark, out_dir).collect()
    )


def test_resume_after_kill_equals_single_shot(spark, transcripts, tmp_path):
    single = str(tmp_path / "single")
    resumed = str(tmp_path / "resumed")

    w1 = lineage.run_with_resume(transcripts, single, n_buckets=N_BUCKETS)
    assert [r["bucket"] for r in w1] == list(range(N_BUCKETS))

    # "killed" after 2 buckets...
    w2a = lineage.run_with_resume(
        transcripts, resumed, n_buckets=N_BUCKETS, max_buckets=2
    )
    assert [r["bucket"] for r in w2a] == [0, 1]
    assert lineage.completed_buckets(spark, resumed) == {0, 1}
    # ...resumed: only pending buckets run
    w2b = lineage.run_with_resume(transcripts, resumed, n_buckets=N_BUCKETS)
    assert [r["bucket"] for r in w2b] == [2, 3]

    assert _collect_triples(spark, single) == _collect_triples(spark, resumed)

    # idempotence: a third invocation is a no-op
    assert lineage.run_with_resume(transcripts, resumed, n_buckets=N_BUCKETS) == []


def test_manifest_lineage_metrics(spark, transcripts, tmp_path):
    out = str(tmp_path / "m")
    lineage.run_with_resume(transcripts, out, n_buckets=N_BUCKETS)
    m = lineage.manifest(spark, out)
    rows = {r.bucket: r for r in m.collect()}
    assert set(rows) == set(range(N_BUCKETS))
    total_turns = transcripts.count()
    assert sum(r.n_turns for r in rows.values()) == total_turns
    stored = lineage.read_triples(spark, out)
    per_bucket = {
        r.bucket: r.cnt
        for r in stored.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    for b, r in rows.items():
        assert r.n_triples == per_bucket.get(b, 0)
        assert r.wall_sec > 0
