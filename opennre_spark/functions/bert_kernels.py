"""Numpy BERT encoder (SURVEY.md §2.8 M4/M5): a float32 transformer
forward matching the reference's `BertModel` usage (bert_encoder.py:
23-33 CLS-pooler path; 123-143 entity-start gather path).

The reference loads HuggingFace bert-base (12x768, transformers==3.4.0,
requirements.txt:2); trained checkpoints are unavailable in this
sandbox, so weights are seed-frozen stand-ins with a smaller default
configuration (4 layers x 128 hidden x 4 heads) — shape-compatible with
bert-base by parameter (SURVEY.md §7: parity is against our re-run of
the same math, pytest re-executes it loop-style as the oracle).

Architecture per BertModel:
  emb = LN(word_emb[ids] + pos_emb[:L] + type_emb[0])
  per layer: multi-head self-attention (additive -10000*(1-mask) on
  scores), residual + LN, FFN with GELU, residual + LN
  pooled = tanh(h[:, 0] @ W_p + b_p)

GELU uses the tanh approximation (documented delta: HF uses erf-exact;
numpy has no vectorized erf — both sides of our parity tests use this
same function, and no trained weights exist to disagree with).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .kernels import softmax


def gelu(x: np.ndarray) -> np.ndarray:
    c = np.float32(0.7978845608028654)  # sqrt(2/pi)
    return (
        0.5 * x * (1.0 + np.tanh(c * (x + np.float32(0.044715) * x * x * x)))
    ).astype(np.float32, copy=False)


def _gelu_into(x: np.ndarray, out: np.ndarray, t: np.ndarray) -> np.ndarray:
    """gelu with every intermediate in caller-provided scratch — the
    expression form allocates ~6 array-sized temporaries per call
    (200+ MB of traffic at a 256x64 eval batch), which dominated the
    eval wall (round-5 kernel profile). Operation ORDER mirrors gelu()
    exactly (IEEE mul/add are commutative, so each in-place step
    rounds identically) — parity tests see bit-identical results."""
    c = np.float32(0.7978845608028654)
    np.multiply(np.float32(0.044715), x, out=t)
    t *= x
    t *= x
    t += x
    t *= c
    np.tanh(t, out=t)
    t += np.float32(1.0)
    np.multiply(np.float32(0.5), x, out=out)
    out *= t
    return out


def layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray, eps: float = 1e-12):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return ((x - mu) / np.sqrt(var + eps) * g + b).astype(np.float32, copy=False)


def _layer_norm_into(
    x: np.ndarray, g: np.ndarray, b: np.ndarray, out: np.ndarray,
    eps: float = 1e-12,
) -> np.ndarray:
    """layer_norm writing into scratch, same op sequence as
    layer_norm() (subtract, divide, scale, shift)."""
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    np.subtract(x, mu, out=out)
    out /= np.sqrt(var + eps)
    out *= g
    out += b
    return out


def make_bert_weights(
    vocab_size: int,
    hidden: int = 128,
    layers: int = 4,
    heads: int = 4,
    intermediate: int = 512,
    max_pos: int = 128,
    seed: int = 1234,
) -> dict:
    rng = np.random.default_rng(seed)

    def normal(shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w = {
        "word_emb": normal((vocab_size, hidden)),
        "pos_emb": normal((max_pos, hidden)),
        "type_emb": normal((2, hidden)),
        "emb_ln_g": np.ones(hidden, np.float32),
        "emb_ln_b": np.zeros(hidden, np.float32),
        "pool_w": normal((hidden, hidden)),
        "pool_b": np.zeros(hidden, np.float32),
        "hidden": np.int64(hidden),
        "heads": np.int64(heads),
        "layers": np.int64(layers),
    }
    for i in range(layers):
        for name, shape in (
            ("q_w", (hidden, hidden)), ("k_w", (hidden, hidden)),
            ("v_w", (hidden, hidden)), ("o_w", (hidden, hidden)),
            ("i_w", (hidden, intermediate)), ("f_w", (intermediate, hidden)),
        ):
            w[f"l{i}_{name}"] = normal(shape)
        for name, dim in (
            ("q_b", hidden), ("k_b", hidden), ("v_b", hidden), ("o_b", hidden),
            ("i_b", intermediate), ("f_b", hidden),
        ):
            w[f"l{i}_{name}"] = np.zeros(dim, np.float32)
        for name in ("att_ln", "ffn_ln"):
            w[f"l{i}_{name}_g"] = np.ones(hidden, np.float32)
            w[f"l{i}_{name}_b"] = np.zeros(hidden, np.float32)
    return w


# fused per-layer weights, cached per weight-set (strong ref pins ids)
_BERT_FUSED: dict = {}


def _fused_qkv(W: dict, i: int):
    key = id(W[f"l{i}_q_w"])
    e = _BERT_FUSED.get(key)
    if e is not None and e[0] is W[f"l{i}_q_w"]:
        return e[1], e[2]
    qkv_w = np.concatenate(
        [W[f"l{i}_q_w"], W[f"l{i}_k_w"], W[f"l{i}_v_w"]], axis=1
    ).astype(np.float32)  # (H, 3H)
    qkv_b = np.concatenate(
        [W[f"l{i}_q_b"], W[f"l{i}_k_b"], W[f"l{i}_v_b"]]
    ).astype(np.float32)
    # bounded (strong refs pin evicted weight sets otherwise); 64 covers
    # 4 cached models x 12 layers before a rebuild cycle
    if len(_BERT_FUSED) >= 64:
        _BERT_FUSED.clear()
    _BERT_FUSED[key] = (W[f"l{i}_q_w"], qkv_w, qkv_b)
    return qkv_w, qkv_b


# eval-forward scratch: module-level reused buffers (one Python worker
# per process, so no sharing hazard — same pattern as kernels._conv_slabs).
# Fresh np allocations at these sizes page-fault + kernel-zero every
# call; reuse removed ~2/3 of the eval wall (round-5 kernel profile).
_FWD_SCRATCH: dict = {}


def _buf(name: str, shape: tuple) -> np.ndarray:
    # keyed by (name, shape): the r7 length-truncated eval path cycles
    # through a handful of (B, Lb) shapes per task (Lb = per-micro-batch
    # max real length rounded to 8), and a name-only key would realloc
    # on every shape flip. Bounded: odd last-chunk sizes could otherwise
    # accumulate buffers without limit on a long-lived worker.
    key = (name,) + shape
    a = _FWD_SCRATCH.get(key)
    if a is None:
        if len(_FWD_SCRATCH) >= 64:
            _FWD_SCRATCH.clear()
        a = np.empty(shape, np.float32)
        _FWD_SCRATCH[key] = a
    return a


def bert_forward(token: np.ndarray, att_mask: np.ndarray, W: dict):
    """(B, L) ids + mask -> (hidden (B, L, H) float32, pooled (B, H)).

    GEMM shape discipline (round 2): every (B, L, H) @ (H, ·) projection
    is flattened to ONE (B*L, H) GEMM — numpy's 3-D @ 2-D broadcasts
    into B separate small GEMMs, which wastes BLAS efficiency at L=64 —
    and the Q/K/V projections fuse into a single (H, 3H) GEMM (weights
    stacked once per process). Round 5 adds the conv-slab treatment
    (VERDICT r4 #5): every intermediate lives in module-level reused
    scratch (np.matmul out= + in-place elementwise with gelu/softmax/
    layer-norm op order preserved exactly), and Q/K/V/ctx move through
    preallocated contiguous buffers instead of fresh transpose copies.
    Same math; results move within the 2e-5 parity tolerance (BLAS
    blocking varies with operand layout, see tests)."""
    B, L = token.shape
    H = int(W["hidden"])
    heads = int(W["heads"])
    dh = H // heads
    x = W["word_emb"][token] + W["pos_emb"][:L][None, :, :] + W["type_emb"][0]
    x = layer_norm(np.asarray(x, dtype=np.float32), W["emb_ln_g"], W["emb_ln_b"])
    # additive mask: 0 for content, -10000 for padding (HF convention)
    add_mask = ((1.0 - att_mask.astype(np.float32)) * np.float32(-10000.0))[
        :, None, None, :
    ]  # (B, 1, 1, L)
    scale = np.float32(1.0 / np.sqrt(dh))
    qkv = _buf("qkv", (B * L, 3 * H))
    q_c = _buf("q", (B, heads, L, dh))
    k_t = _buf("kt", (B, heads, dh, L))
    v_c = _buf("v", (B, heads, L, dh))
    scores = _buf("scores", (B, heads, L, L))
    ctx = _buf("ctx", (B, heads, L, dh))
    ctx2 = _buf("ctx2", (B, L, heads, dh))
    attn_out = _buf("attn_out", (B * L, H))
    ln1 = _buf("ln1", (B, L, H))
    ffn_h = None  # sized per layer (intermediate dim from the weights)
    ffn_o = _buf("ffn_o", (B * L, H))
    ln2 = _buf("ln2", (B, L, H))
    for i in range(int(W["layers"])):
        x2 = x.reshape(B * L, H)
        qkv_w, qkv_b = _fused_qkv(W, i)
        np.matmul(x2, qkv_w, out=qkv)  # one GEMM
        qkv += qkv_b
        # contiguous per-head layouts via strided copy into scratch
        # (matmul on transposed views re-copies internally every time)
        np.copyto(q_c, qkv[:, :H].reshape(B, L, heads, dh).transpose(0, 2, 1, 3))
        np.copyto(
            k_t, qkv[:, H : 2 * H].reshape(B, L, heads, dh).transpose(0, 2, 3, 1)
        )
        np.copyto(v_c, qkv[:, 2 * H :].reshape(B, L, heads, dh).transpose(0, 2, 1, 3))
        np.matmul(q_c, k_t, out=scores)
        scores *= scale
        scores += add_mask
        # softmax, same op order as kernels.softmax, in place
        scores -= np.max(scores, axis=-1, keepdims=True)
        np.exp(scores, out=scores)
        scores /= np.sum(scores, axis=-1, keepdims=True)
        np.matmul(scores, v_c, out=ctx)
        np.copyto(ctx2, ctx.transpose(0, 2, 1, 3))
        np.matmul(ctx2.reshape(B * L, H), W[f"l{i}_o_w"], out=attn_out)
        attn_out += W[f"l{i}_o_b"]
        attn_out += x2
        x = _layer_norm_into(
            attn_out.reshape(B, L, H),
            W[f"l{i}_att_ln_g"], W[f"l{i}_att_ln_b"], ln1,
        )
        x2 = x.reshape(B * L, H)
        i_w = W[f"l{i}_i_w"]
        if ffn_h is None or ffn_h.shape[1] != i_w.shape[1]:
            ffn_h = _buf("ffn_h", (B * L, i_w.shape[1]))
            ffn_t = _buf("ffn_t", (B * L, i_w.shape[1]))
        np.matmul(x2, i_w, out=ffn_h)
        ffn_h += W[f"l{i}_i_b"]
        _gelu_into(ffn_h, ffn_h, ffn_t)
        np.matmul(ffn_h, W[f"l{i}_f_w"], out=ffn_o)
        ffn_o += W[f"l{i}_f_b"]
        ffn_o += x2
        x = _layer_norm_into(
            ffn_o.reshape(B, L, H),
            W[f"l{i}_ffn_ln_g"], W[f"l{i}_ffn_ln_b"], ln2,
        )
        ln1, ln2 = ln2, ln1  # next layer writes the other buffer
    pooled = np.tanh(x[:, 0, :] @ W["pool_w"] + W["pool_b"]).astype(np.float32)
    # hidden escapes the scratch pool (callers gather entity positions
    # from it after the next call could overwrite) — hand back a copy
    return x.copy(), pooled


def bert_cls_rep(token, att_mask, pos1, pos2, W) -> np.ndarray:
    """BERTEncoder.forward (bert_encoder.py:23-33): pooled CLS output."""
    _, pooled = bert_forward(token, att_mask, W)
    return pooled


def bert_entity_rep(token, att_mask, pos1, pos2, W) -> np.ndarray:
    """BERTEntityEncoder.forward (bert_encoder.py:123-143): gather
    hidden state at the head/tail start-marker positions, concat,
    linear."""
    hidden, _ = bert_forward(token, att_mask, W)
    B = hidden.shape[0]
    rows = np.arange(B)
    head = hidden[rows, pos1.reshape(-1)]
    tail = hidden[rows, pos2.reshape(-1)]
    x = np.concatenate([head, tail], axis=1)
    return (x @ W["ent_w"].T + W["ent_b"]).astype(np.float32)


# HF-transformers BertModel state-dict key -> our weight key, embedding/
# pooler level (the reference wraps BertModel as sentence_encoder.bert,
# bert_encoder.py:20,119, and torch saves nested module params under
# dotted paths). HF nn.Linear stores weight as (out, in); our forward
# multiplies x @ W, i.e. (in, out) — entries marked transpose=True.
_BERT_FIXED_MAP = {
    # key suffix under sentence_encoder.bert. -> (ours, transpose)
    "embeddings.word_embeddings.weight": ("word_emb", False),
    "embeddings.position_embeddings.weight": ("pos_emb", False),
    "embeddings.token_type_embeddings.weight": ("type_emb", False),
    "embeddings.LayerNorm.weight": ("emb_ln_g", False),
    "embeddings.LayerNorm.bias": ("emb_ln_b", False),
    "pooler.dense.weight": ("pool_w", True),
    "pooler.dense.bias": ("pool_b", False),
}

# per-layer suffixes under sentence_encoder.bert.encoder.layer.{i}.
_BERT_LAYER_MAP = {
    "attention.self.query.weight": ("q_w", True),
    "attention.self.query.bias": ("q_b", False),
    "attention.self.key.weight": ("k_w", True),
    "attention.self.key.bias": ("k_b", False),
    "attention.self.value.weight": ("v_w", True),
    "attention.self.value.bias": ("v_b", False),
    "attention.output.dense.weight": ("o_w", True),
    "attention.output.dense.bias": ("o_b", False),
    "attention.output.LayerNorm.weight": ("att_ln_g", False),
    "attention.output.LayerNorm.bias": ("att_ln_b", False),
    "intermediate.dense.weight": ("i_w", True),
    "intermediate.dense.bias": ("i_b", False),
    "output.dense.weight": ("f_w", True),
    "output.dense.bias": ("f_b", False),
    "output.LayerNorm.weight": ("ffn_ln_g", False),
    "output.LayerNorm.bias": ("ffn_ln_b", False),
}


# published HF BERT configs (hidden -> num_attention_heads): tiny/mini/
# small/medium/base/large per google-research/bert + HF model cards
_HF_STANDARD_HEADS = {128: 2, 256: 4, 512: 8, 768: 12, 1024: 16}


def load_bert_state_dict_npz(
    path: str, rel2id: dict | None = None, entity: bool = False
) -> dict:
    """S4 checkpoint source, BERT rendition: load an exported .npz of a
    reference softmax BERT model's state dict (tools/export_ckpt.py) into
    our kernel's weight-dict layout.

    Key mapping follows the reference module tree: sentence_encoder.bert
    (HF BertModel, bert_encoder.py:20,119), fc (softmax_nn.py:20), and —
    for BERTEntityEncoder — sentence_encoder.linear (bert_encoder.py:121,
    consumed as x @ W.T so the HF (out, in) layout stays untransposed).
    Config is shape-derived: hidden from the word embedding, layers by
    counting encoder.layer indices; heads are not recoverable from
    shapes, so an explicit `__heads__` entry wins; without one the
    loader accepts only the published HF size table
    (_HF_STANDARD_HEADS, e.g. bert-base 768 -> 12) and REFUSES
    nonstandard hidden sizes rather than guessing.

    rel2id: engine schema map — if the export embeds `__rel2id__`,
    classifier rows are aligned exactly like the CNN loader
    (weights._align_fc_to_rel2id).
    """
    raw = dict(np.load(path))
    pfx = "sentence_encoder.bert."
    w: dict = {}

    def take(key: str, ours: str, transpose: bool):
        if key not in raw:
            raise KeyError(f"BERT checkpoint missing {key!r}")
        a = np.asarray(raw[key], dtype=np.float32)
        w[ours] = np.ascontiguousarray(a.T) if transpose else a

    for suffix, (ours, tr) in _BERT_FIXED_MAP.items():
        take(pfx + suffix, ours, tr)
    layers = sorted(
        {
            int(k[len(pfx) + len("encoder.layer.") :].split(".")[0])
            for k in raw
            if k.startswith(pfx + "encoder.layer.")
        }
    )
    if layers != list(range(len(layers))):
        raise ValueError(f"non-contiguous encoder layers in {path!r}: {layers}")
    for i in layers:
        for suffix, (ours, tr) in _BERT_LAYER_MAP.items():
            take(f"{pfx}encoder.layer.{i}.{suffix}", f"l{i}_{ours}", tr)
    take("fc.weight", "fc_w", False)
    take("fc.bias", "fc_b", False)
    if entity:
        take("sentence_encoder.linear.weight", "ent_w", False)
        take("sentence_encoder.linear.bias", "ent_b", False)
    # BagAttention checkpoints carry the diag parameter under its torch
    # state-dict name "diag" (bag_attention.py:29); sentence-model
    # checkpoints have none — default to the ones init
    if "diag" in raw:
        w["att_diag"] = np.asarray(raw["diag"], dtype=np.float32)
    elif "att_diag" in raw:
        w["att_diag"] = np.asarray(raw["att_diag"], dtype=np.float32)
    else:
        w["att_diag"] = np.ones(w["fc_w"].shape[1], dtype=np.float32)
    hidden = w["word_emb"].shape[1]
    w["hidden"] = np.int64(hidden)
    w["layers"] = np.int64(len(layers))
    if "__heads__" in raw:
        heads = int(raw["__heads__"])
    elif hidden in _HF_STANDARD_HEADS:
        # the heads = hidden // 64 convention is only trustworthy for
        # the published HF size table; guessing it for a nonstandard
        # hidden would silently change every attention output
        heads = _HF_STANDARD_HEADS[hidden]
    else:
        raise ValueError(
            f"BERT checkpoint {path!r} lacks __heads__ and hidden size "
            f"{hidden} is not a standard HF config — re-export with "
            "tools/export_ckpt.py (which records __heads__) or add a "
            "__heads__ entry; refusing to guess the head count"
        )
    if heads <= 0 or hidden % heads != 0:
        raise ValueError(f"invalid head count {heads} for hidden size {hidden}")
    w["heads"] = np.int64(heads)
    from .weights import _align_fc_to_rel2id

    _align_fc_to_rel2id(w, raw, rel2id, path)
    return w


def save_bert_state_dict_npz(
    weights: dict, path: str, rel2id: dict | None = None,
    keep_diag: bool = True,
) -> None:
    """Checkpoint sink for TRAINED BERT weights: writes the HF-style
    dotted-key .npz rendition (the exact inverse of
    load_bert_state_dict_npz's key map, transposes included), so a
    fine-tuned model saves into the SAME S4 format a reference export
    produces and reloads through the production loader — the
    train -> save -> load -> infer lifecycle is one format end to end.
    Records __heads__ (the loader refuses to guess nonstandard head
    counts) and the engine's __rel2id__. Atomic (tmp + rename).

    keep_diag=False omits the `diag` entry: the reference's SoftmaxNN
    state dict has no such key (only BagAttention creates it,
    bag_attention.py:29), so a sentence-model save that included it
    would deviate from the format a strict torch load_state_dict
    expects (ADVICE r4). The loader synthesizes att_diag=ones on
    reload, which is exactly the untrained value for non-attention
    models."""
    import json
    import os

    pfx = "sentence_encoder.bert."
    arrays: dict = {}

    def put(key, ours, transpose):
        a = np.asarray(weights[ours], dtype=np.float32)
        arrays[key] = np.ascontiguousarray(a.T) if transpose else a

    for suffix, (ours, tr) in _BERT_FIXED_MAP.items():
        put(pfx + suffix, ours, tr)
    for i in range(int(weights["layers"])):
        for suffix, (ours, tr) in _BERT_LAYER_MAP.items():
            put(f"{pfx}encoder.layer.{i}.{suffix}", f"l{i}_{ours}", tr)
    put("fc.weight", "fc_w", False)
    put("fc.bias", "fc_b", False)
    if "ent_w" in weights:
        put("sentence_encoder.linear.weight", "ent_w", False)
        put("sentence_encoder.linear.bias", "ent_b", False)
    if keep_diag and "att_diag" in weights:
        put("diag", "att_diag", False)  # torch state-dict name
    arrays["__heads__"] = np.int64(int(weights["heads"]))
    if rel2id is not None:
        arrays["__rel2id__"] = np.str_(json.dumps(rel2id))
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def default_bert_model(
    entity: bool = False, schema: str = "reduced", ckpt: str | None = None
):
    """(vocab, weights) for the BERT path — deterministic, per-process.
    The classifier fc + (for the entity encoder) the 2H->2H linear are
    included in the weight dict (softmax_nn.py:20; bert_encoder.py:121).

    ckpt: optional exported .npz BERT state dict (S4) — mirrors
    weights.default_model's route, incl. the (mtime, size) cache stamp
    so a swapped file reloads.
    """
    stamp = None
    if ckpt is not None:
        import os

        st = os.stat(ckpt)
        stamp = (st.st_mtime_ns, st.st_size)
    return _default_bert_model_cached(entity, schema, ckpt, stamp)


@lru_cache(maxsize=4)
def _default_bert_model_cached(
    entity: bool, schema: str, ckpt: str | None, _stamp: tuple | None
):
    from .. import relations
    from .bert_tokenization import build_wordpiece_vocab

    vocab = build_wordpiece_vocab()
    rel2id = relations.rel2id_for(schema)
    if ckpt is not None:
        W = load_bert_state_dict_npz(ckpt, rel2id=rel2id, entity=entity)
        if W["fc_w"].shape[0] != len(rel2id):
            raise ValueError(
                f"checkpoint has {W['fc_w'].shape[0]} relations, "
                f"schema {schema!r} has {len(rel2id)}"
            )
        if W["word_emb"].shape[0] != len(vocab):
            raise ValueError(
                f"checkpoint vocab {W['word_emb'].shape[0]} rows, "
                f"engine wordpiece vocab has {len(vocab)}"
            )
        want_rep = 2 * int(W["hidden"]) if entity else int(W["hidden"])
        if W["fc_w"].shape[1] != want_rep:
            raise ValueError(
                "checkpoint encoder kind does not match the entity flag"
            )
        return vocab, W
    W = make_bert_weights(vocab_size=len(vocab))
    H = int(W["hidden"])
    rng = np.random.default_rng(4321)
    rep = 2 * H if entity else H
    if entity:
        W["ent_w"] = (rng.standard_normal((2 * H, 2 * H)) * 0.02).astype(np.float32)
        W["ent_b"] = np.zeros(2 * H, np.float32)
    W["fc_w"] = (rng.standard_normal((len(rel2id), rep)) / np.sqrt(rep)).astype(
        np.float32
    )
    W["fc_b"] = np.zeros(len(rel2id), np.float32)
    # BagAttention's diag parameter (ones init, bag_attention.py:29) —
    # present so the BERT bag-att model trains/evals like the CNN one
    W["att_diag"] = np.ones(rep, np.float32)
    return vocab, W
