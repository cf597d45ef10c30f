"""Instance encoding: (text, head span, tail span) -> dense int arrays.

Reference semantics: BaseEncoder.tokenize (/root/reference/opennre/
encoder/base_encoder.py:84-154) and the PCNN variant's extra segment
mask (/root/reference/opennre/encoder/pcnn_encoder.py:155-172):

  1. order-normalize the two char spans by start offset (rev flag,
     base_encoder.py:102-107);
  2. tokenize the five slices sent0|ent0|sent1|ent1|sent2 separately and
     concatenate (base_encoder.py:108-116) — this guarantees entity
     boundaries always fall on token boundaries;
  3. token-level entity starts recomputed from slice lengths
     (base_encoder.py:117-122);
  4. ids with UNK fallback, truncate/pad to max_length with PAD
     (base_encoder.py:127-128);
  5. relative positions pos_k[i] = min(i - ent_start + L, 2L-1) with
     ent_start clamped to L; pad positions get 0 (base_encoder.py:132-148);
  6. PCNN mask: 1 for i <= min(start1,start2), 2 for i <= max, 3 after,
     0 for pad (pcnn_encoder.py:155-170).

The batch entry point `encode_batch` is what the Arrow UDF kernels
call: python-loop tokenization per row (string work), numpy-vectorized
position/mask construction across the whole batch.
"""

from __future__ import annotations

import numpy as np

from .tokenization import _SIMPLE_ASCII, clean_and_split, tokens_to_ids


def _encode_normalized(
    text: str,
    a0: int, a1: int, b0: int, b1: int,
    vocab: dict[str, int],
    max_length: int,
    pad_id: int,
    unk_id: int,
    mask_entity: bool,
):
    """The span-order-normalized core of encode_instance ((a0, a1) is
    the earlier span): tokenize the five slices, id-encode, return
    (ids, first_start, second_start, n_tokens). A pure function of its
    arguments — the direction of a pair (which span is head) does not
    change it, which is what lets encode_tokens_batch memoize it per
    (text, spans) and pay the string work once for a cross-turn pair's
    two directed instances (and for exact duplicate instances)."""
    if _SIMPLE_ASCII.match(text):
        # one whole-text check instead of five per-slice checks: every
        # substring of printable-ASCII text is printable-ASCII, so
        # clean_and_split degenerates to str.split for all five slices
        sent0 = text[:a0].split()
        ent0 = text[a0:a1].split()
        sent1 = text[a1:b0].split()
        ent1 = text[b0:b1].split()
        sent2 = text[b1:].split()
    else:
        sent0 = clean_and_split(text[:a0])
        ent0 = clean_and_split(text[a0:a1])
        sent1 = clean_and_split(text[a1:b0])
        ent1 = clean_and_split(text[b0:b1])
        sent2 = clean_and_split(text[b1:])
    if mask_entity:
        ent0 = ["[UNK]"]
        ent1 = ["[UNK]"]
    tokens = sent0 + ent0 + sent1 + ent1 + sent2
    first_start = len(sent0)
    second_start = len(sent0) + len(ent0) + len(sent1)
    ids = tokens_to_ids(tokens, vocab, max_length, pad_id, unk_id)
    return ids, first_start, second_start, len(tokens)


def encode_instance(
    text: str,
    h_pos: tuple[int, int],
    t_pos: tuple[int, int],
    vocab: dict[str, int],
    max_length: int,
    pad_id: int,
    unk_id: int,
    mask_entity: bool = False,
):
    """Encode one instance. Returns (token_ids, head_start, tail_start)
    where head/tail starts are token-level, already clamped to
    max_length. Positions/mask are built vectorized in encode_batch.
    """
    h0, h1 = int(h_pos[0]), int(h_pos[1])
    t0, t1 = int(t_pos[0]), int(t_pos[1])
    if h0 > t0:
        (a0, a1), (b0, b1) = (t0, t1), (h0, h1)
        rev = True
    else:
        (a0, a1), (b0, b1) = (h0, h1), (t0, t1)
        rev = False
    ids, first_start, second_start, n_tokens = _encode_normalized(
        text, a0, a1, b0, b1, vocab, max_length, pad_id, unk_id, mask_entity
    )
    if rev:
        head_start, tail_start = second_start, first_start
    else:
        head_start, tail_start = first_start, second_start
    return ids, min(head_start, max_length), min(tail_start, max_length), n_tokens


def encode_tokens_batch(
    texts,
    h_starts,
    h_ends,
    t_starts,
    t_ends,
    vocab: dict[str, int],
    max_length: int,
    pad_id: int,
    unk_id: int,
):
    """The per-row (string-work) half of encode_batch: tokenize + id
    lookup only. Returns dict of int64 arrays token (B,L), p1_start (B,),
    p2_start (B,), n_real (B,) — the minimal state from which
    positions_from_starts rebuilds pos1/pos2/mask bit-identically.

    This split is what lets a multi-query workload pay the tokenization
    cost once (reference behavior: one tokenize pass at data load feeds
    every consumer, data_loader.py:183-205): persist (token, starts,
    n_real) and each query re-derives the positional features, which are
    pure vectorized functions of the starts.
    """
    B = len(texts)
    L = max_length
    token = np.empty((B, L), dtype=np.int64)
    p1_start = np.empty(B, dtype=np.int64)
    p2_start = np.empty(B, dtype=np.int64)
    n_real = np.empty(B, dtype=np.int64)
    # r7 tokenize memo: the per-row string work is a pure function of
    # (text, span-order-normalized spans) — a cross-turn pair's two
    # directed instances (adjacent in the batch since candidate_pairs
    # repartitions pre-explode) and exact duplicate instances hit the
    # memo and copy the already-encoded row instead of re-tokenizing.
    # Bounded per call (one Arrow batch), results bit-identical by
    # construction.
    memo: dict[tuple, tuple[int, int, int, int]] = {}
    for i in range(B):
        h0, h1 = int(h_starts[i]), int(h_ends[i])
        t0, t1 = int(t_starts[i]), int(t_ends[i])
        if h0 > t0:
            key_spans = (t0, t1, h0, h1)
            rev = True
        else:
            key_spans = (h0, h1, t0, t1)
            rev = False
        key = (texts[i],) + key_spans
        hit = memo.get(key)
        if hit is None:
            ids, first, second, n = _encode_normalized(
                texts[i], *key_spans, vocab, L, pad_id, unk_id, False
            )
            token[i] = ids
            memo[key] = (i, first, second, n)
        else:
            j, first, second, n = hit
            token[i] = token[j]
        if rev:
            hs, ts = second, first
        else:
            hs, ts = first, second
        p1_start[i] = min(hs, L)
        p2_start[i] = min(ts, L)
        n_real[i] = min(n, L)
    return {
        "token": token,
        "p1_start": p1_start,
        "p2_start": p2_start,
        "n_real": n_real,
    }


def positions_from_starts(
    p1_start: np.ndarray,
    p2_start: np.ndarray,
    n_real: np.ndarray,
    max_length: int,
    with_mask: bool = True,
):
    """Vectorized relative positions (base_encoder.py:132-148): for real
    token positions i < n_real, pos_k = min(i - start + L, 2L-1); padded
    tail gets 0. Returns dict with pos1, pos2 [, mask] (B,L) int64.
    """
    L = max_length
    idx = np.arange(L, dtype=np.int64)[None, :]  # (1, L)
    real = idx < n_real[:, None]  # (B, L)
    pos1 = np.minimum(idx - p1_start[:, None] + L, 2 * L - 1)
    pos2 = np.minimum(idx - p2_start[:, None] + L, 2 * L - 1)
    out = {
        "pos1": np.where(real, pos1, 0),
        "pos2": np.where(real, pos2, 0),
    }
    if with_mask:
        # pcnn_encoder.py:155-170, over real positions only.
        seg_lo = np.minimum(p1_start, p2_start)[:, None]
        seg_hi = np.maximum(p1_start, p2_start)[:, None]
        mask = np.where(idx <= seg_lo, 1, np.where(idx <= seg_hi, 2, 3))
        out["mask"] = np.where(real, mask, 0)
    return out


def encode_batch(
    texts,
    h_starts,
    h_ends,
    t_starts,
    t_ends,
    vocab: dict[str, int],
    max_length: int,
    pad_id: int,
    unk_id: int,
    with_mask: bool = True,
):
    """Encode a batch. Returns dict of int64 numpy arrays:
    token (B,L), pos1 (B,L), pos2 (B,L), mask (B,L) [if with_mask].
    """
    enc = encode_tokens_batch(
        texts, h_starts, h_ends, t_starts, t_ends,
        vocab, max_length, pad_id, unk_id,
    )
    pos = positions_from_starts(
        enc["p1_start"], enc["p2_start"], enc["n_real"], max_length,
        with_mask=with_mask,
    )
    out = {"token": enc["token"], "n_real": enc["n_real"], **pos}
    return out
