"""Machine-ceiling probe for the N->4N scaling criterion.

Runs a tiny in-L1 float32 GEMM loop (64x64, zero DRAM traffic, zero
shared data) at 8 and 32 concurrent processes. Any 8->32 efficiency
loss measured HERE is the box itself — virtualized per-core speed is
higher when only 8 of 32 vCPUs are busy (host turbo / contention) —
and bounds what ANY workload can show on this machine. Report this
ceiling next to job efficiency: job_eff / ceiling_eff is the
machine-normalized scaling efficiency, the number that models real
N->4N executor scale-out (each executor runs at all-busy steady state).

Usage: python tools/cpu_ceiling.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["OPENBLAS_NUM_THREADS"] = "1"
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["MKL_NUM_THREADS"] = "1"

from multiprocessing import Barrier, Process, Queue

import numpy as np

ITERS = 20_000


def worker(barrier, q):
    a = np.random.default_rng(0).standard_normal((64, 64)).astype(np.float32)
    b = a.copy()
    c = np.empty_like(a)
    for _ in range(200):
        np.matmul(a, b, out=c)
    barrier.wait()
    t0 = time.time()
    for _ in range(ITERS):
        np.matmul(a, b, out=c)
    q.put(time.time() - t0)


def bench(n: int) -> float:
    barrier = Barrier(n)
    q: Queue = Queue()
    ps = [Process(target=worker, args=(barrier, q)) for _ in range(n)]
    for p in ps:
        p.start()
    ts = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return ITERS * n / max(ts)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best8 = best32 = 0.0
    for rep in range(reps):
        r8, r32 = bench(8), bench(32)
        best8, best32 = max(best8, r8), max(best32, r32)
        print(
            f"rep{rep}: 8p={r8:,.0f} gemms/s 32p={r32:,.0f} gemms/s "
            f"eff={(r32 / r8) / 4:.3f}"
        )
    print(
        f"machine ceiling (max-of-{reps}): 8p={best8:,.0f} 32p={best32:,.0f} "
        f"eff={(best32 / best8) / 4:.3f}"
    )


if __name__ == "__main__":
    main()
