"""r7 stage isolation for the kg pipeline at a given corpus size
(guide §1.4: noop-sink timing per stage, so we optimize the stage that
actually costs, not the one we suspect).

Times, over the SAME materialized transcripts parquet bench.py uses:
  - mentions:        detect_mentions noop
  - candidates:      mentions -> candidate_pairs noop
  - encode:          encode_candidates noop (mentions+join+repart+tokenize)
  - score_enc:       score_encoded over a persisted encode (GEMM half only)
  - sentence_tail:   full kg_sentence_enc minus score (join+dedup share)
  - kg_sentence:     fused end-to-end (the bench headline)
  - bag_att_tail:    bag aggregation from persisted encode

Usage: python tools/bench_r07_stages.py [n_convs] [reps]  (solo!)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from opennre_spark import relations
    from opennre_spark.operators.candidates import candidate_pairs
    from opennre_spark.operators.mentions import detect_mentions
    from opennre_spark.pipeline import encode_candidates, extract_triples
    from opennre_spark.session import get_spark
    from opennre_spark.sources.transcripts import transcripts_df

    spark = get_spark("stages_r07", cores=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def _warm(it):
        from opennre_spark.functions.weights import default_model

        default_model()
        for pdf in it:
            yield pdf

    spark.range(0, 4 * cpus, numPartitions=4 * cpus).mapInPandas(
        _warm, "id long"
    ).count()

    path = f"/tmp/spark_graft_bench_{n_convs}.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        transcripts_df(spark, n_convs).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    t = spark.read.parquet(path)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"r07:{name}")
        t0 = time.time()
        fn()
        dt = time.time() - t0
        times.setdefault(name, []).append(round(dt, 3))
        spark.sparkContext.setJobDescription(None)

    for _ in range(reps):
        timed("mentions", lambda: noop(detect_mentions(t, relations.gazetteer())))
        timed(
            "candidates",
            lambda: noop(candidate_pairs(detect_mentions(t, relations.gazetteer()))),
        )
        timed("encode", lambda: noop(encode_candidates(t)))
        enc = encode_candidates(t).persist()
        timed("encode_persist_count", lambda: enc.count())
        from opennre_spark.operators.scoring import score_encoded

        pruned = enc.select(
            "h_id", "t_id", "tok_bin", "h_start", "t_start", "n_tok"
        )
        timed("score_enc", lambda: noop(score_encoded(pruned, with_rep=False)))
        timed(
            "sentence_enc_full",
            lambda: extract_triples(t, mode="sentence", encoded=enc).count(),
        )
        timed(
            "bag_att_full",
            lambda: extract_triples(
                t, mode="att", threshold=0.15, encoded=enc
            ).count(),
        )
        timed(
            "bag_one_full",
            lambda: extract_triples(
                t, mode="one", threshold=0.15, encoded=enc
            ).count(),
        )
        enc.unpersist()
        timed("kg_sentence_fused", lambda: extract_triples(t, mode="sentence").count())

    out = {
        "n_convs": n_convs,
        "cpus": cpus,
        "min": {k: min(v) for k, v in times.items()},
        "all": times,
    }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
