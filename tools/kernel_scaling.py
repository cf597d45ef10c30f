"""Kernel-only scaling probe: run the CNN (default) or BERT (--bert)
scoring kernel in N concurrent worker processes (no Spark) and report
per-process and aggregate throughput. Isolates the numpy kernel's
memory-bandwidth ceiling from Spark/Arrow/shuffle effects — the 8 vs 32
comparison says how much of the end-to-end 8->32 efficiency loss is the
kernel itself.

Usage: python tools/kernel_scaling.py [--bert] [nprocs ...] (default: 8 32)
"""

from __future__ import annotations

import os
import sys
import time
from multiprocessing import Barrier, Process, Queue

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = 40_000  # instances per worker
BERT_ROWS = 2_000  # the transformer is ~50x the CNN cost per row
MICRO = 256


def bert_worker(barrier, q, seed):
    """BERT eval path (bert_kernels.bert_cls_rep, the M4 kernel the
    kg_triples_bert query drives) — round-5 scratch-reuse rendition."""
    import numpy as np

    from opennre_spark.functions import bert_kernels as bk
    from opennre_spark.functions.bert_tokenization import build_wordpiece_vocab

    vocab = build_wordpiece_vocab()
    W = bk.make_bert_weights(len(vocab))
    rng = np.random.default_rng(seed)
    L = 64
    token = rng.integers(0, len(vocab), (BERT_ROWS, L))
    mask = np.ones((BERT_ROWS, L), dtype=np.int64)
    pos = np.zeros((BERT_ROWS, 1), dtype=np.int64)
    bk.bert_cls_rep(token[:MICRO], mask[:MICRO], pos[:MICRO], pos[:MICRO], W)
    barrier.wait()
    t0 = time.time()
    for lo in range(0, BERT_ROWS, MICRO):
        hi = min(lo + MICRO, BERT_ROWS)
        bk.bert_cls_rep(token[lo:hi], mask[lo:hi], pos[lo:hi], pos[lo:hi], W)
    q.put(time.time() - t0)


def worker(barrier, q, seed):
    import numpy as np

    from opennre_spark.functions import kernels
    from opennre_spark.functions.weights import build_vocab, make_weights
    from opennre_spark import relations

    vocab = build_vocab(relations.vocabulary_words())
    W = make_weights(len(relations.REL2ID), len(vocab))
    rng = np.random.default_rng(seed)
    L = 40
    n_real = rng.integers(6, 14, ROWS)  # realistic short-turn lengths
    token = np.zeros((ROWS, L), dtype=np.int64)
    pos1 = np.zeros((ROWS, L), dtype=np.int64)
    pos2 = np.zeros((ROWS, L), dtype=np.int64)
    for i in range(ROWS):
        n = n_real[i]
        token[i, :n] = rng.integers(0, len(vocab) - 2, n)
        pos1[i, :n] = rng.integers(1, 2 * L - 1, n)
        pos2[i, :n] = rng.integers(1, 2 * L - 1, n)
    # warm
    batch = {
        "token": token[:MICRO], "pos1": pos1[:MICRO], "pos2": pos2[:MICRO],
        "n_real": n_real[:MICRO],
    }
    kernels.sentence_scores(batch, W)
    barrier.wait()
    t0 = time.time()
    for lo in range(0, ROWS, MICRO):
        hi = min(lo + MICRO, ROWS)
        batch = {
            "token": token[lo:hi], "pos1": pos1[lo:hi], "pos2": pos2[lo:hi],
            "n_real": n_real[lo:hi],
        }
        kernels.sentence_scores(batch, W)
    q.put(time.time() - t0)


def run(nproc: int, bert: bool = False) -> float:
    barrier = Barrier(nproc)
    q: Queue = Queue()
    target = bert_worker if bert else worker
    rows = BERT_ROWS if bert else ROWS
    ps = [Process(target=target, args=(barrier, q, i)) for i in range(nproc)]
    for p in ps:
        p.start()
    times = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = max(times)
    rows_per_sec = rows * nproc / wall
    print(
        f"nproc={nproc}: wall={wall:.2f}s agg={rows_per_sec:,.0f} rows/s "
        f"per-proc={rows / wall:,.0f} rows/s"
    )
    return rows_per_sec


def main():
    args = sys.argv[1:]
    bert = "--bert" in args
    procs = [int(a) for a in args if a != "--bert"] or [8, 32]
    rates = {}
    for n in procs:
        rates[n] = run(n, bert=bert)
    if len(procs) == 2:
        lo, hi = procs
        eff = (rates[hi] / rates[lo]) / (hi / lo)
        kind = "bert" if bert else "cnn"
        print(f"{kind} kernel-only efficiency {lo}->{hi}: {eff:.3f}")


if __name__ == "__main__":
    main()
