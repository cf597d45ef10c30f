"""Two-parallelism scaling benchmark (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; no real cluster in this
sandbox, so evidence = the identical job at two local[] parallelism
levels on byte-identical input — BASELINE.md targets table).

Two N->4N pairs are reported:
  - local[2] -> local[8]: the regime that models multi-EXECUTOR scaling
    (on a real cluster each executor owns its memory bus; 2 and 8
    workers on this box both run far from the DRAM bandwidth ceiling);
  - local[8] -> local[32]: saturating a single 32-core box — this pins
    4N python workers onto ONE memory bus, so it bounds below what 4N
    distinct executors would do.

Each measurement runs in its own subprocess (fresh JVM). Prints a JSON
summary and rewrites BENCH.md.
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

cores = int(sys.argv[1]); n_convs = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark("scaling", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
# materialize the input table once (production input is an Iceberg/
# parquet table on storage, not a generator) — byte-identical across
# parallelism levels by generator determinism
if not os.path.exists(path):
    transcripts_df(spark, n_convs).repartition(64).write.mode("overwrite").parquet(path)

def _warm(it):
    from opennre_spark.functions.weights import default_model
    default_model()
    for pdf in it:
        yield pdf
spark.range(0, 4 * cores, numPartitions=4 * cores).mapInPandas(_warm, "id long").count()

t = spark.read.parquet(path)
n_turns = t.count()
# the sandbox box shows ~30% run-to-run noise (shared/virtualized CPU);
# min of repeated runs estimates true throughput capability (noise only
# ever ADDS wall time)
times = []
for _ in range(2):
    t0 = time.time()
    n_triples = extract_triples(t, mode="sentence").count()
    times.append(time.time() - t0)
dt = min(times)
print("RESULT " + json.dumps({"cores": cores, "turns": n_turns,
      "triples": n_triples, "sec": round(dt, 3),
      "all_runs_sec": [round(x, 3) for x in times],
      "triples_per_sec": round(n_triples / dt, 1),
      "turns_per_sec": round(n_turns / dt, 1)}))
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


def measure_pair(n_small: int, n_big: int, n_convs: int, reps: int = 2) -> dict:
    """Interleave the two levels (lo, hi, lo, hi, ...) and take the
    min wall per level: the virtualized host's per-core speed drifts on
    ~minutes timescales (tools/cpu_ceiling.py), so measuring the levels
    back-to-back in alternation samples both under the same host state
    instead of biasing whichever level ran in the faster window."""
    path = f"/tmp/spark_graft_transcripts_{n_convs}.parquet"
    lows, highs = [], []
    for _ in range(reps):
        lows.append(run(n_small, n_convs, path))
        highs.append(run(n_big, n_convs, path))
    lo = min(lows, key=lambda r: r["sec"])
    hi = min(highs, key=lambda r: r["sec"])
    speedup = lo["sec"] / hi["sec"]
    return {
        "pair": f"local[{n_small}] -> local[{n_big}]",
        "n_convs": n_convs,
        "low": lo,
        "high": hi,
        "all_low_sec": [r["sec"] for r in lows],
        "all_high_sec": [r["sec"] for r in highs],
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (n_big / n_small), 3),
    }


def main():
    pairs = []
    pairs.append(measure_pair(2, 8, int(os.environ.get("SCALING_SMALL_CONVS", "10000"))))
    pairs.append(measure_pair(8, 32, int(os.environ.get("SCALING_N_CONVS", "30000"))))
    print(json.dumps(pairs))

    rows = []
    for p in pairs:
        rows.append(
            f"| {p['pair']} | {p['n_convs']} | {p['low']['turns']} "
            f"| {p['low']['sec']} | {p['high']['sec']} "
            f"| {p['low']['turns_per_sec']} -> {p['high']['turns_per_sec']} "
            f"| {p['speedup']}x | **{p['efficiency']}** |"
        )
    table = (
        "| pair (N -> 4N) | convs | turns | N wall (s) | 4N wall (s) "
        "| turns/s | speedup | efficiency |\n"
        "|---|---|---|---|---|---|---|---|\n" + "\n".join(rows)
    )
    # refresh ONLY the marked table in BENCH.md — the narrative (machine
    # ceiling, per-stage breakdown, kernel history) is maintained by hand
    bench_md = os.path.join(REPO, "BENCH.md")
    begin, end = "<!-- scaling-table:begin -->", "<!-- scaling-table:end -->"
    with open(bench_md) as f:
        md = f.read()
    if begin in md and end in md:
        pre, rest = md.split(begin, 1)
        _, post = rest.split(end, 1)
        md = pre + begin + "\n" + table + "\n" + end + post
    else:
        md += f"\n{begin}\n{table}\n{end}\n"
    with open(bench_md, "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
