"""Two-parallelism scaling benchmark for the TRAINING loop (the
round-3/4 A3 surface): one epoch of distributed bag-attention training
— distant-supervision labeling, one tokenize/encode pass, bag assembly,
then large-batch synchronous SGD steps (broadcast weights down, one
SUM-form gradient partial per partition up) — run at local[8] and
local[32] on byte-identical parquet input, interleaved lo/hi with
min-of-reps per level (the bench_scaling protocol; see BENCH.md for
why 8->32 on this box is bounded by the 0.583 machine ceiling).

The measured quantity is instances/sec through a full epoch including
the encode pass, because that IS a training run's cost profile; steps
are large-batch (few sync barriers) — the 100 TB operating point
documented in docs/PERFORMANCE.md.

    python tools/bench_train_scaling.py            # full pair
    python tools/bench_train_scaling.py 8 30000 /tmp/x.parquet  # one child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "__REPO__")
from pyspark.sql import functions as F
from opennre_spark.session import get_spark
from opennre_spark.sources.transcripts import gold_df, transcripts_df
from opennre_spark.operators.training import (
    distant_supervision_instances, train_bag_attention,
)

cores = int(sys.argv[1]); n_convs = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark("train_scaling", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
if not os.path.exists(path):
    transcripts_df(spark, n_convs).write.mode("overwrite").parquet(path)
t = spark.read.parquet(path)
facts = gold_df(spark, n_convs).select(
    "h_id", F.col("pred").alias("relation"), "t_id"
).distinct()
# localCheckpoint: the DS labeling lineage (mention detect + candidate
# join) runs once, outside the timed window — the measurement is the
# TRAINING epoch proper (encode pass + bag assembly + optimizer steps)
inst = distant_supervision_instances(t, facts).localCheckpoint()
n_inst = inst.count()
t0 = time.time()
_, hist = train_bag_attention(
    inst, epochs=1, batch_size=4096, lr=0.1, weight_decay=1e-5, seed=42,
)
wall = time.time() - t0
print(json.dumps({
    "cores": cores, "n_instances": n_inst,
    "n_steps": hist[0]["n_steps"] if hist else 0,
    "sec": round(wall, 3),
    "instances_per_sec": round(n_inst / wall, 1),
}))
"""


def run_child(cores: int, n_convs: int, path: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD.replace("__REPO__", REPO),
         str(cores), str(n_convs), path],
        capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not line:
        sys.exit(f"child failed (cores={cores}):\n{p.stderr[-2000:]}")
    return json.loads(line[-1])


def main() -> None:
    n_convs = int(os.environ.get("TRAIN_SCALING_CONVS", "30000"))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "transcripts.parquet")
        lo_runs, hi_runs = [], []
        for _ in range(2):  # interleaved lo, hi, lo, hi
            lo_runs.append(run_child(8, n_convs, path))
            hi_runs.append(run_child(32, n_convs, path))
    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    eff = (hi["instances_per_sec"] / lo["instances_per_sec"]) / 4.0
    print(json.dumps({
        "pair": "local[8] -> local[32]",
        "n_convs": n_convs,
        "low": {**lo, "all_runs_sec": [r["sec"] for r in lo_runs]},
        "high": {**hi, "all_runs_sec": [r["sec"] for r in hi_runs]},
        "speedup": round(hi["instances_per_sec"] / lo["instances_per_sec"], 3),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) == 4:
        # single-child mode for manual probing
        print(run_child(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]))
    else:
        main()
