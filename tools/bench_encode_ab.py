"""Same-session A/B for the encode-once lever (VERDICT r5 #1).

Runs the CNN trio (sentence + bag_one + bag_att) over one sf0.1-sized
corpus two ways, interleaved, on one Spark session — so box noise hits
both arms equally:
  A (default): each query runs the full pipeline (scan -> candidate
     join -> repartition -> tokenize -> score -> agg) independently.
  B (shared):  encode_candidates() persisted once, the three queries
     consume it via extract_triples(encoded=).
Prints one JSON line with per-arm trio walls (min/median across
rounds) and the B/A ratio. Run ALONE (bench protocol).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
    n_convs = int(os.environ.get("SPARK_GRAFT_N_CONVS", "4000"))

    from opennre_spark.pipeline import encode_candidates, extract_triples
    from opennre_spark.session import get_spark
    from opennre_spark.sources.transcripts import transcripts_df

    spark = get_spark("bench_encode_ab", cores=cpus, shuffle_partitions=2 * cpus)
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
    transcripts_df(spark, n_convs).repartition(64).write.mode("overwrite").parquet(path)
    transcripts = spark.read.parquet(path)
    n_turns = transcripts.count()

    TRIO = (
        dict(mode="sentence"),
        dict(mode="one", threshold=0.15),
        dict(mode="att", threshold=0.15),
    )

    a_walls, b_walls, b_encode = [], [], []
    for _ in range(reps):
        t0 = time.time()
        for kw in TRIO:
            extract_triples(transcripts, **kw).count()
        a_walls.append(round(time.time() - t0, 3))

        t0 = time.time()
        enc = encode_candidates(transcripts).persist()
        enc.count()
        t_enc = time.time() - t0
        for kw in TRIO:
            extract_triples(transcripts, encoded=enc, **kw).count()
        enc.unpersist()
        b_walls.append(round(time.time() - t0, 3))
        b_encode.append(round(t_enc, 3))

    out = {
        "n_convs": n_convs,
        "turns": n_turns,
        "cpus": cpus,
        "reps": reps,
        "a_default_trio": a_walls,
        "b_shared_trio": b_walls,
        "b_encode_part": b_encode,
        "a_min": min(a_walls),
        "b_min": min(b_walls),
        "a_median": round(statistics.median(a_walls), 3),
        "b_median": round(statistics.median(b_walls), 3),
        "ratio_min": round(min(b_walls) / min(a_walls), 3),
        "ratio_median": round(
            statistics.median(b_walls) / statistics.median(a_walls), 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
