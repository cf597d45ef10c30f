"""Per-stage local[8]/local[32] breakdown of the flagship pipeline
(round-2 verdict ask): times the relational front half (scan -> mention
detect -> candidate self-join) separately from the full pipeline, so the
scoring stage's share and each half's own scaling are visible.

Each level runs in its own subprocess/JVM over the same materialized
parquet. min-of-2 per measurement (box noise only adds time).

Usage: python tools/bench_stages.py  (solo — no concurrent Spark!)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "__REPO__")
from opennre_spark.session import get_spark
from opennre_spark.sources.transcripts import transcripts_df
from opennre_spark.pipeline import extract_triples
from opennre_spark.operators.mentions import detect_mentions
from opennre_spark.operators.candidates import candidate_pairs
from opennre_spark import relations

cores = int(sys.argv[1]); n_convs = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark("stages", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
if not os.path.exists(path):
    transcripts_df(spark, n_convs).repartition(64).write.mode("overwrite").parquet(path)

def _warm(it):
    from opennre_spark.functions.weights import default_model
    default_model()
    for pdf in it:
        yield pdf
spark.range(0, 4 * cores, numPartitions=4 * cores).mapInPandas(_warm, "id long").count()

t = spark.read.parquet(path)

def timed(fn):
    times = []
    for _ in range(2):
        t0 = time.time(); fn(); times.append(time.time() - t0)
    return round(min(times), 3)

front = timed(lambda: candidate_pairs(detect_mentions(t, relations.gazetteer())).count())
full = timed(lambda: extract_triples(t, mode="sentence").count())
print("RESULT " + json.dumps({"cores": cores,
    "front_half_sec": front, "full_sec": full,
    "scoring_share_sec": round(full - front, 3)}))
"""


def run(cores: int, n_convs: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.replace("__REPO__", REPO),
         str(cores), str(n_convs), path],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}: {out.stderr[-2000:]}")


def main():
    n_convs = int(os.environ.get("SCALING_N_CONVS", "30000"))
    path = f"/tmp/spark_graft_transcripts_{n_convs}.parquet"
    rows = [run(8, n_convs, path), run(32, n_convs, path)]
    print(json.dumps(rows))
    lo, hi = rows
    for key in ("front_half_sec", "full_sec", "scoring_share_sec"):
        sp = lo[key] / hi[key] if hi[key] else float("nan")
        print(f"{key}: {lo[key]}s -> {hi[key]}s  speedup {sp:.2f}x  eff {sp/4:.3f}")


if __name__ == "__main__":
    main()
