"""Dense inference kernels in float32 numpy — the vectorized re-expression
of the reference's PyTorch modules (eval mode: dropout is identity).

Reference math:
  - embedding concat [word; pos1; pos2]   /root/reference/opennre/encoder/
    base_encoder.py:56-69 + cnn_encoder.py:58-60
  - Conv1d(kernel 3, pad 1) + ReLU + MaxPool over full length (PAD
    positions included in the pool)          cnn_encoder.py:43-44,58-64
  - PCNN piecewise pool: conv + (-100)*(1-segment_onehot) -> ReLU -> max,
    3 segments concatenated; the fixed 4x3 mask-embedding table is the
    identity rows [[0,0,0],[1,0,0],[0,1,0],[0,0,1]]
                                             pcnn_encoder.py:45-52,66-78
  - linear classifier logits = rep @ W.T + b   softmax_nn.py:20,50
  - softmax over last axis                     softmax_nn.py:53-54

All intermediates are float32; reductions keep the same operand order as
the reference (max over L, sum over channels via matmul) so scores agree
to ~1e-6 (the reference's own golden tolerance, tests/test_inference.py:11).
"""

from __future__ import annotations

import numpy as np


def sigmoid(x: np.ndarray) -> np.ndarray:
    """SigmoidNN.logit_to_score (sigmoid_nn.py:39-40)."""
    return (1.0 / (1.0 + np.exp(-x))).astype(np.float32, copy=False)


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=axis, keepdims=True)


def embed_concat(
    token: np.ndarray,  # (B, L) int
    pos1: np.ndarray,
    pos2: np.ndarray,
    word_emb: np.ndarray,  # (V, word_size) float32
    pos1_emb: np.ndarray,  # (2L, pos_size) float32, row 0 zeros
    pos2_emb: np.ndarray,
) -> np.ndarray:
    """(B, L, word+2*pos) float32 input features (base_encoder.py:56-69)."""
    return np.concatenate(
        [word_emb[token], pos1_emb[pos1], pos2_emb[pos2]], axis=2
    )


def conv1d_same(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """1-D convolution over the length axis with symmetric zero padding.

    x: (B, L, C); w: (H, C, K); b: (H,). Returns (B, L_out, H) where
    L_out = L + 2*pad - K + 1 with pad = (K-1)//2 (K=3, pad=1 -> L).

    Decomposed as K shifted GEMMs accumulating into one output buffer:
    out[:, t, :] = sum_k xp[:, t+k, :] @ w[:, :, k].T. This avoids
    materializing the (B, L, C*K) im2col matrix — with 32 concurrent
    Python workers the im2col copy made the kernel memory-bandwidth-
    bound and capped multi-core scaling (measured ~1.7x at 4x cores).
    """
    B, L, C = x.shape
    H, _, K = w.shape
    pad = (K - 1) // 2
    Lp = L + 2 * pad
    xp = np.zeros((B, Lp, C), dtype=np.float32)
    xp[:, pad : pad + L, :] = x
    x2 = xp.reshape(B * Lp, C)
    out = np.broadcast_to(b.astype(np.float32), (B, L, H)).copy()
    y = np.empty((B * Lp, H), dtype=np.float32)
    for k in range(K):
        np.matmul(x2, w[:, :, k].T.astype(np.float32), out=y)  # one GEMM
        out += y.reshape(B, Lp, H)[:, k : k + L, :]
    return out


def cnn_forward(
    token: np.ndarray,
    pos1: np.ndarray,
    pos2: np.ndarray,
    weights: dict,
    n_real: np.ndarray | None = None,
) -> np.ndarray:
    """CNNEncoder.forward (cnn_encoder.py:46-65): (B, H) sentence reps.

    Exact length-truncation optimization: the reference pools over the
    FULL padded length (cnn_encoder.py:44 MaxPool1d(max_length)), but
    every window that contains only [PAD] inputs evaluates to the bias
    (word PAD row and position row 0 are zeros, base_encoder.py:62-69),
    so its pooled contribution is relu(bias) — a constant vector. With
    n_real given, the conv runs only over positions that can touch a
    real token (t <= max(n_real), window t covers tokens t-1..t+1) and
    relu(bias) joins the max explicitly when fully-pad windows exist.
    Bit-identical results; 2-3x less compute+bandwidth on short turns.
    """
    L = token.shape[1]
    if n_real is not None:
        Lc = int(min(int(n_real.max()) + 1, L))
    else:
        Lc = L
    x = embed_concat(
        token[:, :Lc], pos1[:, :Lc], pos2[:, :Lc],
        weights["word_emb"], weights["pos1_emb"], weights["pos2_emb"],
    )
    c = conv1d_same(x, weights["conv_w"], weights["conv_b"])  # (B, Lc, H)
    pooled = np.maximum(c, 0.0).max(axis=1)
    if Lc < L:
        pad_contrib = np.maximum(weights["conv_b"], 0.0)
        # rows with n_real < L have at least one fully-pad window beyond
        # Lc only when Lc < L; within [0, Lc) their own pad windows were
        # already computed identically (pad inputs are zeros for all rows)
        np.maximum(pooled, pad_contrib[None, :], out=pooled)
    return pooled


def pcnn_forward(
    token: np.ndarray,
    pos1: np.ndarray,
    pos2: np.ndarray,
    mask: np.ndarray,  # (B, L) in {0,1,2,3}
    weights: dict,
    n_real: np.ndarray | None = None,
) -> np.ndarray:
    """PCNNEncoder.forward (pcnn_encoder.py:54-80): (B, 3H) reps.

    Length truncation is exact here too: pad positions carry mask 0, so
    every segment adds -100 to them (pcnn_encoder.py:72-75) and their
    relu is 0 — the floor of a relu max — provided |bias| < 100 (the
    reference's fixed _minus=-100 contract, pcnn_encoder.py:50).
    """
    L = token.shape[1]
    if n_real is not None:
        Lc = int(min(int(n_real.max()) + 1, L))
        token, pos1, pos2, mask = (
            a[:, :Lc] for a in (token, pos1, pos2, mask)
        )
    x = embed_concat(
        token, pos1, pos2,
        weights["word_emb"], weights["pos1_emb"], weights["pos2_emb"],
    )
    c = conv1d_same(x, weights["conv_w"], weights["conv_b"])  # (B, Lc, H)
    # segment one-hots from the fixed identity table (pcnn_encoder.py:47-49)
    outs = []
    minus = np.float32(-100.0)
    for seg in (1, 2, 3):
        gate = (mask == seg).astype(np.float32)  # (B, L)
        shifted = c + minus * (1.0 - gate)[:, :, None]
        outs.append(np.maximum(shifted, 0.0).max(axis=1))  # (B, H)
    return np.concatenate(outs, axis=1).astype(np.float32, copy=False)


def linear(rep: np.ndarray, fc_w: np.ndarray, fc_b: np.ndarray) -> np.ndarray:
    """logits = rep @ W.T + b (softmax_nn.py:50)."""
    return rep @ fc_w.T + fc_b


def sentence_scores(batch: dict, weights: dict, pcnn: bool = False) -> tuple:
    """Full sentence path: encode -> fc -> softmax.

    Returns (rep (B,H|3H), probs (B,N)) — rep is kept because the bag
    aggregators (attention/average) consume representations, not scores
    (bag_attention.py:152-164, bag_average.py:117-128).
    """
    n_real = batch.get("n_real")
    if pcnn:
        rep = pcnn_forward(
            batch["token"], batch["pos1"], batch["pos2"], batch["mask"],
            weights, n_real=n_real,
        )
    else:
        rep = cnn_forward(
            batch["token"], batch["pos1"], batch["pos2"], weights, n_real=n_real
        )
    logits = linear(rep, weights["fc_w"], weights["fc_b"])
    return rep, softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# Bag-level aggregators (eval path, bag_size=0 "all sentences" variant).
# Each takes the (n, H) reps of one bag and returns the per-relation
# score vector (N,), matching the reference's *softmaxed* bag logits.
# ---------------------------------------------------------------------------

def bag_attention_eval(rep: np.ndarray, weights: dict) -> np.ndarray:
    """Selective attention, eval (bag_attention.py:136-164).

    att_mat = fc_w.T * diag[:, None]; att_score = rep @ att_mat (n, N);
    per-relation softmax over the bag -> (N, n); rep_for_rel = att.T @ rep
    (N, H); score_r = softmax(fc(rep_for_rel))[r, r] (diagonal).
    """
    fc_w, fc_b, diag = weights["fc_w"], weights["fc_b"], weights["att_diag"]
    att_mat = fc_w.T * diag[:, None]  # (H, N)
    att_score = rep @ att_mat  # (n, N)
    sm = softmax(att_score.T, axis=-1)  # (N, n): softmax over bag members
    rep_for_rel = sm @ rep  # (N, H)
    logits = linear(rep_for_rel, fc_w, fc_b)  # (N, N)
    return np.diagonal(softmax(logits, axis=-1)).copy()


def bag_average_eval(rep: np.ndarray, weights: dict) -> np.ndarray:
    """Mean of reps then fc+softmax (bag_average.py:117-131)."""
    bag_rep = rep.mean(axis=0, dtype=np.float32)
    logits = linear(bag_rep[None, :], weights["fc_w"], weights["fc_b"])
    return softmax(logits, axis=-1)[0]


def bag_one_eval(probs: np.ndarray) -> np.ndarray:
    """Per-relation max over per-sentence softmax scores
    (bag_one.py:140-148). Takes the (n, N) softmaxed sentence scores.
    This one decomposes associatively -> also expressible as a native
    Spark groupBy().agg(max()) (see operators/bags.py).
    """
    return probs.max(axis=0)
