"""Two-parallelism scaling benchmark (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; no real cluster in this
sandbox, so evidence = the identical job at local[8] vs local[32] on
byte-identical deterministic input — BASELINE.md targets table).

Each measurement runs in its own subprocess (fresh JVM) so the two
parallelism levels don't share executor state. Prints a JSON summary
and rewrites BENCH.md.
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
t = spark.read.parquet(path)
n_turns = t.count()  # also warms JVM + python workers
t0 = time.time()
n_triples = extract_triples(t, mode="sentence").count()
dt = time.time() - t0
print("RESULT " + json.dumps({"cores": cores, "turns": n_turns,
      "triples": n_triples, "sec": round(dt, 3),
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


def main():
    n_convs = int(os.environ.get("SCALING_N_CONVS", "8000"))
    path = f"/tmp/spark_graft_transcripts_{n_convs}.parquet"
    r8 = run(8, n_convs, path)
    r32 = run(32, n_convs, path)
    speedup = r8["sec"] / r32["sec"]
    efficiency = speedup / 4.0
    summary = {"n_convs": n_convs, "local8": r8, "local32": r32,
               "speedup_8_to_32": round(speedup, 3),
               "scaling_efficiency": round(efficiency, 3)}
    print(json.dumps(summary))

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — throughput & scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox (BASELINE.md targets
table), so the evidence is the identical flagship job — deterministic
synthetic transcripts ({n_convs} conversations, {r8['turns']} turns,
byte-identical at any parallelism) -> mention detection -> windowed
candidate pairs -> CNN relation scoring -> triple dedup — run at
local[8] and local[32] in separate JVMs.

| parallelism | wall (s) | turns/s | triples/s |
|---|---|---|---|
| local[8]  (N)  | {r8['sec']} | {r8['turns_per_sec']} | {r8['triples_per_sec']} |
| local[32] (4N) | {r32['sec']} | {r32['turns_per_sec']} | {r32['triples_per_sec']} |

speedup 8->32: **{speedup:.2f}x** of an ideal 4.00x
scaling efficiency: **{efficiency:.3f}** (target >= 0.8)

Reproduce: `python tools/bench_scaling.py` (SCALING_N_CONVS={n_convs}).
Per-round headline timings: `python bench.py` (BENCH_r*.json).
""")


if __name__ == "__main__":
    main()
