"""10x-scale proof run (VERDICT r5 #2): flagship CNN + BERT headline
paths at an sf1-equivalent corpus (40,000 convs ~ 378k turns; BERT
corpus scaled with it to 1,000 convs), evidencing two claims:

1. The measured fixed-overhead share SHRINKS with corpus size: at
   sf0.1 roughly 2/3 of the scoring-stage wall is Arrow crossings +
   shuffle + scheduling, not compute (docs/ROUND5.md #2). Evidence =
   end-to-end scored-instances/s at 32 procs for the SAME code at
   sf0.1-size vs 10x, same session — if the rate rises toward the solo
   kernel aggregate (tools/kernel_scaling.py: CNN ~365k rows/s, BERT
   ~2,632 rows/s at 32 procs), the fixed share fell.

2. 8->32 scaling efficiency HOLDS (or improves) at 10x: interleaved
   local[8]/local[32] pair on the byte-identical big corpus, min wall
   per level (the bench_scaling.py drift protocol).

Each measurement runs in its own subprocess (fresh JVM). Run ALONE.
Prints one JSON line; paste the table into BENCH.md by hand (this run
is a round milestone, not a per-round artifact).
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

cores = int(sys.argv[1]); n_convs = int(sys.argv[2]); runs = int(sys.argv[3])
n_bert = max(20, n_convs // 40)
spark = get_spark("sf1", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")

def _warm(it):
    from opennre_spark.functions.weights import default_model
    default_model()
    for pdf in it:
        yield pdf
spark.range(0, 4 * cores, numPartitions=4 * cores).mapInPandas(_warm, "id long").count()

path = f"/tmp/spark_graft_transcripts_{n_convs}.parquet"
if not os.path.exists(path):
    transcripts_df(spark, n_convs).repartition(64).write.mode("overwrite").parquet(path)
bpath = f"/tmp/spark_graft_transcripts_{n_bert}.parquet"
if not os.path.exists(bpath):
    transcripts_df(spark, n_bert).repartition(32).write.mode("overwrite").parquet(bpath)

t = spark.read.parquet(path)
n_turns = t.count()
# scored-instance counts (the throughput denominator), outside the
# timed window — a cheap relational job
inst = candidate_pairs(detect_mentions(t, relations.gazetteer())).count()
bt = spark.read.parquet(bpath)
n_bturns = bt.count()
binst = candidate_pairs(detect_mentions(bt, relations.gazetteer())).count()

cnn_times, bert_times = [], []
for _ in range(runs):
    t0 = time.time()
    n_triples = extract_triples(t, mode="sentence").count()
    cnn_times.append(round(time.time() - t0, 3))
for _ in range(runs):
    t0 = time.time()
    extract_triples(bt, mode="sentence", encoder="bert").count()
    bert_times.append(round(time.time() - t0, 3))

print("RESULT " + json.dumps({
    "cores": cores, "n_convs": n_convs, "turns": n_turns,
    "instances": inst, "bert_turns": n_bturns, "bert_instances": binst,
    "cnn_sec": min(cnn_times), "cnn_all": cnn_times,
    "bert_sec": min(bert_times), "bert_all": bert_times,
    "triples": n_triples,
}))
"""


def run(cores: int, n_convs: int, runs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.replace("__REPO__", REPO),
         str(cores), str(n_convs), str(runs)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            print(f"# done cores={cores} convs={n_convs}: "
                  f"cnn={r['cnn_all']} bert={r['bert_all']}", file=sys.stderr)
            return r
    raise RuntimeError(f"no RESULT cores={cores}: {out.stderr[-2000:]}")


def main():
    small = int(os.environ.get("SF1_SMALL_CONVS", "4000"))
    big = int(os.environ.get("SF1_BIG_CONVS", "40000"))
    # interleave levels so the host's minutes-scale drift samples both
    # under the same conditions; big-corpus children run once each,
    # small-corpus children twice (cheap)
    seq = [(32, small, 2), (32, big, 1), (8, big, 1),
           (32, big, 1), (8, big, 1), (32, small, 2)]
    samples: dict[tuple[int, int], list[dict]] = {}
    for cores, convs, runs in seq:
        samples.setdefault((cores, convs), []).append(run(cores, convs, runs))

    def best(cores, convs, key):
        return min(min(r[key + "_all"]) for r in samples[(cores, convs)])

    out = {"small_convs": small, "big_convs": big}
    meta_small = samples[(32, small)][0]
    meta_big = samples[(32, big)][0]
    out["meta"] = {
        "small": {k: meta_small[k] for k in
                  ("turns", "instances", "bert_turns", "bert_instances")},
        "big": {k: meta_big[k] for k in
                ("turns", "instances", "bert_turns", "bert_instances")},
    }
    # claim 1: overhead share vs scale, 32 procs
    for label, convs, meta in (("small", small, meta_small), ("big", big, meta_big)):
        c = best(32, convs, "cnn")
        b = best(32, convs, "bert")
        out[f"cnn32_{label}"] = {
            "wall": c, "inst_per_s": round(meta["instances"] / c, 1),
            "turns_per_s": round(meta["turns"] / c, 1),
        }
        out[f"bert32_{label}"] = {
            "wall": b, "inst_per_s": round(meta["bert_instances"] / b, 1),
        }
    # claim 2: 8->32 at the big corpus
    for kernel in ("cnn", "bert"):
        lo = best(8, big, kernel)
        hi = best(32, big, kernel)
        out[f"{kernel}_8_32"] = {
            "wall8": lo, "wall32": hi,
            "speedup": round(lo / hi, 3),
            "efficiency": round(lo / hi / 4, 3),
        }
    out["all_samples"] = {
        f"{c}c_{n}convs": [
            {"cnn_all": r["cnn_all"], "bert_all": r["bert_all"]}
            for r in v
        ]
        for (c, n), v in samples.items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
