"""Deterministic model weights + vocabulary.

The reference downloads trained checkpoints (pretrain.py:100-124); that
is unavailable here, so parity is defined against a re-run of the
reference math with *these* frozen, seed-generated weights (the pytest
oracle in tests/oracle/ executes the same math independently, loop-style,
per SURVEY.md §5). Shapes mirror wiki80_cnn_softmax (pretrain.py:136-146)
at max_length=40.

Vocabulary protocol follows BaseEncoder (/root/reference/opennre/encoder/
base_encoder.py:48-63): caller vocab gets '[UNK]' then '[PAD]' appended;
word-embedding rows for them are random-normal/sqrt(d) and zeros
respectively; position embeddings use padding_idx=0 => row 0 zeros.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import config


def build_vocab(words) -> dict[str, int]:
    """Lowercased word -> id, then [UNK], [PAD] appended (base_encoder.py:48-53).

    convert_by_vocab lowercases lookups (utils.py:190-191), so keys are
    stored lowercase; duplicates keep the first id, matching dict-insert
    order semantics of the reference's word2id json.
    """
    vocab: dict[str, int] = {}
    for w in words:
        lw = w.lower()
        if lw not in vocab:
            vocab[lw] = len(vocab)
    vocab["[UNK]"] = len(vocab)
    vocab["[PAD]"] = len(vocab)
    return vocab


def _set_trunc_flag(w: dict) -> dict:
    """The eval kernel's exact length-truncation (kernels.cnn_forward)
    is sound only while the PAD word row (the LAST vocab row — [UNK]
    then [PAD] are appended at the end, base_encoder.py:48-53 /
    build_vocab) and position row 0 are zero, so every fully-padded
    window pools to relu(bias). Seed-frozen weights satisfy that by
    construction and torch keeps the pos rows zero via padding_idx —
    but the word PAD row is TRAINABLE in the reference (no padding_idx,
    base_encoder.py:56), so a trained checkpoint can carry a non-zero
    PAD row. Computed HERE, at every weight-construction site, so no
    path can hand the kernel a dict without the soundness flag; the
    kernel defaults missing flags to False (full-length conv, correct
    for any weights)."""
    w["exact_trunc"] = np.bool_(
        not w["word_emb"][-1].any()
        and not w["pos1_emb"][0].any()
        and not w["pos2_emb"][0].any()
    )
    return w


def make_weights(
    num_rel: int,
    vocab_size: int,
    seed: int = 42,
    pcnn: bool = False,
    max_length: int = config.MAX_LENGTH,
    word_size: int = config.WORD_SIZE,
    position_size: int = config.POSITION_SIZE,
    hidden_size: int = config.HIDDEN_SIZE,
    kernel_size: int = config.KERNEL_SIZE,
) -> dict[str, np.ndarray]:
    """Frozen float32 weight dict, a pure function of (shape, seed)."""
    rng = np.random.default_rng(seed)

    def normal(shape, scale):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    word_emb = normal((vocab_size, word_size), 1.0 / np.sqrt(word_size))
    word_emb[-1, :] = 0.0  # [PAD] row zeros (base_encoder.py:62-63)

    pos1_emb = normal((2 * max_length, position_size), 0.5)
    pos2_emb = normal((2 * max_length, position_size), 0.5)
    pos1_emb[0, :] = 0.0  # padding_idx=0 (base_encoder.py:68-69)
    pos2_emb[0, :] = 0.0

    input_size = word_size + 2 * position_size
    conv_w = normal(
        (hidden_size, input_size, kernel_size),
        1.0 / np.sqrt(input_size * kernel_size),
    )
    conv_b = normal((hidden_size,), 0.02)

    rep_size = hidden_size * 3 if pcnn else hidden_size
    fc_w = normal((num_rel, rep_size), 1.0 / np.sqrt(rep_size))
    fc_b = normal((num_rel,), 0.02)

    return _set_trunc_flag({
        "word_emb": word_emb,
        "pos1_emb": pos1_emb,
        "pos2_emb": pos2_emb,
        "conv_w": conv_w,
        "conv_b": conv_b,
        "fc_w": fc_w,
        "fc_b": fc_b,
        # attention diag initialized to ones (bag_attention.py:29)
        "att_diag": np.ones((rep_size,), dtype=np.float32),
        "max_length": np.int64(max_length),
        "pcnn": np.bool_(pcnn),
    })


# torch state_dict key -> our weight-dict key, for wiki80_cnn_softmax /
# pcnn-shaped checkpoints (module attribute names: base_encoder.py:56-69
# word/pos embeddings, cnn_encoder.py:43 self.conv, softmax_nn.py:20
# self.fc). nn.Conv1d stores (out, in, k) == our conv_w layout; nn.Linear
# stores (num_class, rep) == our fc_w layout — no transposes needed.
_STATE_DICT_MAP = {
    "sentence_encoder.word_embedding.weight": "word_emb",
    "sentence_encoder.pos1_embedding.weight": "pos1_emb",
    "sentence_encoder.pos2_embedding.weight": "pos2_emb",
    "sentence_encoder.conv.weight": "conv_w",
    "sentence_encoder.conv.bias": "conv_b",
    "fc.weight": "fc_w",
    "fc.bias": "fc_b",
}


def _align_fc_to_rel2id(
    w: dict[str, np.ndarray], raw: dict, rel2id: dict[str, int] | None, path: str
) -> None:
    """Reorder classifier rows to the engine's relation-id order when the
    checkpoint carries its own rel2id (exported by tools/export_ckpt.py
    as `__rel2id__`).

    The reference distributes rel2id.json per benchmark with an arbitrary
    id order (e.g. the downloaded nyt10_rel2id.json); our fixtures
    reconstruct the label SET but cannot know that order. Matching only
    the relation COUNT would silently permute fc_w rows across labels —
    every prediction mislabeled with no error (ADVICE r2). With the
    ckpt's rel2id present we permute fc rows into the engine order; a
    label-set mismatch fails fast."""
    if "__rel2id__" not in raw:
        return
    import json

    ckpt_rel2id = json.loads(str(raw["__rel2id__"]))
    if rel2id is None:
        return
    if set(ckpt_rel2id) != set(rel2id):
        missing = sorted(set(rel2id) - set(ckpt_rel2id))[:3]
        extra = sorted(set(ckpt_rel2id) - set(rel2id))[:3]
        raise ValueError(
            f"checkpoint {path!r} rel2id label set does not match the "
            f"engine schema (missing {missing}, extra {extra})"
        )
    perm = [
        ckpt_rel2id[name]
        for name, _ in sorted(rel2id.items(), key=lambda kv: kv[1])
    ]
    if perm != list(range(len(perm))):
        w["fc_w"] = w["fc_w"][perm]
        w["fc_b"] = w["fc_b"][perm]


def load_state_dict_npz(
    path: str, rel2id: dict[str, int] | None = None
) -> dict[str, np.ndarray]:
    """S4 checkpoint source: load a reference checkpoint exported to
    .npz (tools/export_ckpt.py converts `torch.load(ckpt)['state_dict']`
    — pretrain.py:147 — on a torch-equipped machine; this sandbox has no
    torch, so the loader consumes the exported rendition).

    Accepts either raw state-dict key names or already-mapped keys.
    Derived fields (max_length, pcnn, att_diag) are inferred from the
    shapes the same way the reference constructors size their modules
    (base_encoder.py:68: pos tables have 2*max_length rows; a PCNN rep
    is 3*hidden wide).

    rel2id: the engine schema's relation->id map. If the export carries
    the benchmark's own rel2id (`__rel2id__`), classifier rows are
    permuted into this order (or the load fails fast on a label-set
    mismatch) — see _align_fc_to_rel2id.
    """
    raw = dict(np.load(path))
    if "sentence_encoder.bert.embeddings.word_embeddings.weight" in raw:
        # BERT-family checkpoint (CLS or entity encoder): delegate to
        # the transformer loader so one S4 entry point serves both
        # encoder families (pretrain.py routes by model name the same
        # way)
        from .bert_kernels import load_bert_state_dict_npz

        return load_bert_state_dict_npz(
            path, rel2id=rel2id,
            entity="sentence_encoder.linear.weight" in raw,
        )
    w: dict[str, np.ndarray] = {}
    for src, dst in _STATE_DICT_MAP.items():
        if src in raw:
            w[dst] = np.asarray(raw[src], dtype=np.float32)
        elif dst in raw:
            w[dst] = np.asarray(raw[dst], dtype=np.float32)
        else:
            raise KeyError(f"checkpoint missing {src!r} (or mapped {dst!r})")
    hidden = w["conv_w"].shape[0]
    w["att_diag"] = (
        np.asarray(raw["att_diag"], dtype=np.float32)
        if "att_diag" in raw
        else np.ones((w["fc_w"].shape[1],), dtype=np.float32)
    )
    w["max_length"] = np.int64(w["pos1_emb"].shape[0] // 2)
    w["pcnn"] = np.bool_(w["fc_w"].shape[1] == 3 * hidden)
    _align_fc_to_rel2id(w, raw, rel2id, path)
    return _set_trunc_flag(w)


def save_weights_npz(
    weights: dict, path: str, rel2id: dict[str, int] | None = None,
    keep_diag: bool = True,
) -> None:
    """Checkpoint sink for TRAINED weights (the `torch.save({'state_dict':
    ...})` best-checkpoint write, bag_re.py:146-149 / sentence_re.py:135-138):
    writes the mapped-key .npz rendition that load_state_dict_npz accepts,
    embedding the engine's rel2id (`__rel2id__`) so a reload can never
    silently permute classifier rows across relation labels. Atomic
    (tmp + rename) so a concurrent reader never sees a torn file.

    BERT weight dicts (no conv_w) delegate to the HF-dotted-key sink
    (bert_kernels.save_bert_state_dict_npz) — same dispatch as the
    loader, so the train loop's ckpt/resume machinery is
    encoder-family-agnostic. keep_diag=False drops BagAttention's
    `diag` from BERT saves — sentence-model checkpoints should match
    the reference SoftmaxNN state-dict key set (see
    save_bert_state_dict_npz); the engine-native CNN format is
    unaffected (its loader always expects att_diag)."""
    import json
    import os

    if "conv_w" not in weights:
        from .bert_kernels import save_bert_state_dict_npz

        save_bert_state_dict_npz(
            weights, path, rel2id=rel2id, keep_diag=keep_diag
        )
        return

    arrays = {k: np.asarray(weights[k]) for k in (
        "word_emb", "pos1_emb", "pos2_emb", "conv_w", "conv_b",
        "fc_w", "fc_b", "att_diag",
    )}
    if rel2id is not None:
        arrays["__rel2id__"] = np.str_(json.dumps(rel2id))
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def default_model(pcnn: bool = False, schema: str = "reduced", ckpt: str | None = None):
    """(vocab, weights) for a named schema — cached so every
    executor/test builds it exactly once per process.

    schema: 'reduced' (8-relation NYT-style, NA=0), 'wiki80'
    (80 Wikidata properties, no NA — pretrain.py:136-146 wiki80 config)
    or 'nyt10' (53 Freebase relations, NA=0 — the reference's headline
    distant-supervision benchmark, pretrain.py:126-148 + README.md:28-43).

    ckpt: optional path to an exported .npz state dict (S4) — the
    drop-in route for real reference weights; seed-frozen generation
    stays the fallback. Shape mismatches against the schema fail fast.
    The cache key includes the ckpt file's (mtime, size): swapping the
    .npz under a long-lived driver/executor reloads instead of serving
    stale weights (ADVICE r2). os.stat per call is ~1us — invisible next
    to one Arrow batch.
    """
    stamp = None
    if ckpt is not None:
        import os

        st = os.stat(ckpt)
        stamp = (st.st_mtime_ns, st.st_size)
    return _default_model_cached(pcnn, schema, ckpt, stamp)


@lru_cache(maxsize=8)
def _default_model_cached(
    pcnn: bool, schema: str, ckpt: str | None, _stamp: tuple | None
):
    from .. import relations

    vocab = build_vocab(relations.vocabulary_words())
    rel2id = relations.rel2id_for(schema)

    if ckpt is not None:
        weights = load_state_dict_npz(ckpt, rel2id=rel2id)
        if weights["fc_w"].shape[0] != len(rel2id):
            raise ValueError(
                f"checkpoint has {weights['fc_w'].shape[0]} relations, "
                f"schema {schema!r} has {len(rel2id)}"
            )
        if weights["word_emb"].shape[0] != len(vocab):
            raise ValueError(
                f"checkpoint vocab {weights['word_emb'].shape[0]} rows, "
                f"engine vocab has {len(vocab)}"
            )
        if bool(weights["pcnn"]) != pcnn:
            raise ValueError("checkpoint encoder kind does not match pcnn flag")
        return vocab, weights
    weights = make_weights(num_rel=len(rel2id), vocab_size=len(vocab), pcnn=pcnn)
    return vocab, weights
