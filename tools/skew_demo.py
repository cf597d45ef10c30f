"""Hot-entity-pair skew demonstration for the `att` bag path
(VERDICT r2 item 8): measure that the deterministic bag cap, enforced
BEFORE collect_list (bags.bag_scores_batched), bounds executor memory
on a pathological bag, while the uncapped whole-bag assembly exhausts
a constrained heap.

Protocol: each scenario runs in its OWN JVM with a deliberately small
heap (SPARK_DRIVER_MEM, default 1g — local mode puts driver and
executors in one JVM, so this bounds the aggregation buffer arena the
way a real executor's heap would). The input is one hot (h, t) pair
with N_HOT members — rep vectors generated JVM-side, no parquet — plus
background bags. `att` with bag_size=0 genuinely needs whole bags, so
bag_cap is exactly the knob that makes the buffer boundable.

Run both scenarios and print a summary:

    python tools/skew_demo.py --all [n_hot]

Run one scenario (exit code reports survival):

    python tools/skew_demo.py <bag_cap> [n_hot]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOT_DEFAULT = 400_000
N_BG_BAGS = 500
BG_MEMBERS = 20
HEAP = os.environ.get("SPARK_DRIVER_MEM", "1g")


def build_input(spark, n_hot: int):
    """(h_id, t_id, conv_id, turn_idx, pair_turn_idx, h_begin, t_begin,
    rep[230]) — one hot pair with n_hot members + background bags.
    rep values are a cheap deterministic hash expression; the point is
    buffer VOLUME, not the math."""
    from pyspark.sql import functions as F

    from opennre_spark import config

    hot = spark.range(n_hot).select(
        F.lit("HOT_H").alias("h_id"),
        F.lit("HOT_T").alias("t_id"),
        F.concat(F.lit("c"), (F.col("id") % 97).cast("string")).alias("conv_id"),
        (F.col("id") % 1000).cast("int").alias("turn_idx"),
        (F.col("id") % 7).cast("int").alias("pair_turn_idx"),
        (F.col("id") % 11).cast("int").alias("h_begin"),
        (F.col("id") % 13).cast("int").alias("t_begin"),
        F.col("id").alias("__seed"),
    )
    bg = spark.range(N_BG_BAGS * BG_MEMBERS).select(
        F.concat(F.lit("h"), (F.col("id") % N_BG_BAGS).cast("string")).alias("h_id"),
        F.concat(F.lit("t"), (F.col("id") % N_BG_BAGS).cast("string")).alias("t_id"),
        F.concat(F.lit("bc"), (F.col("id") % 31).cast("string")).alias("conv_id"),
        (F.col("id") % 100).cast("int").alias("turn_idx"),
        F.lit(0).alias("pair_turn_idx"),
        F.lit(0).alias("h_begin"),
        F.lit(1).alias("t_begin"),
        (F.col("id") + 10_000_000).alias("__seed"),
    )
    H = config.HIDDEN_SIZE
    rep = F.transform(
        F.sequence(F.lit(0), F.lit(H - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("__seed") * H + i), F.lit(1000)).cast("float")
            / 1000.0
        ).cast("float"),
    )
    return hot.unionByName(bg).withColumn("rep", rep).drop("__seed")


def run_scenario(bag_cap: int, n_hot: int) -> None:
    from opennre_spark.operators.bags import bag_scores_batched
    from opennre_spark.session import get_spark

    spark = get_spark(
        f"skew_demo_cap{bag_cap}",
        cores=8,
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")
    scored = build_input(spark, n_hot)
    t0 = time.time()
    n = bag_scores_batched(scored, method="att", bag_cap=bag_cap).count()
    print(
        json.dumps(
            {"bag_cap": bag_cap, "bags": n, "wall_sec": round(time.time() - t0, 2)}
        )
    )


def run_all(n_hot: int) -> None:
    results = {}
    for cap in (64, 0):
        env = dict(os.environ, SPARK_DRIVER_MEM=HEAP)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cap), str(n_hot)],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        wall = round(time.time() - t0, 2)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        oom = (
            "OutOfMemoryError" in p.stderr
            or "OutOfMemoryError" in p.stdout
            or "SparkOutOfMemory" in p.stderr
        )
        results[f"cap={cap}"] = {
            "survived": p.returncode == 0,
            "oom": oom,
            "proc_wall_sec": wall,
            "result": json.loads(line[-1]) if (p.returncode == 0 and line) else None,
        }
        tail = "\n".join(p.stderr.splitlines()[-3:])
        print(f"--- cap={cap}: rc={p.returncode} oom={oom} wall={wall}s\n{tail}")
    print(
        json.dumps(
            {"heap": HEAP, "n_hot": n_hot, "scenarios": results}, indent=2
        )
    )


if __name__ == "__main__":
    if sys.argv[1] == "--all":
        run_all(int(sys.argv[2]) if len(sys.argv) > 2 else N_HOT_DEFAULT)
    else:
        run_scenario(
            int(sys.argv[1]),
            int(sys.argv[2]) if len(sys.argv) > 2 else N_HOT_DEFAULT,
        )
