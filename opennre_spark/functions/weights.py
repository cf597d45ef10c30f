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

    return {
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
    }


@lru_cache(maxsize=8)
def default_model(pcnn: bool = False, schema: str = "reduced"):
    """(vocab, weights) for a named schema — cached so every
    executor/test builds it exactly once per process.

    schema: 'reduced' (8-relation NYT-style, NA=0) or 'wiki80'
    (80 Wikidata properties, no NA — pretrain.py:136-146 wiki80 config).
    """
    from .. import relations

    vocab = build_vocab(relations.vocabulary_words())
    rel2id = (
        relations.REL2ID if schema == "reduced" else relations.wiki80_rel2id()
    )
    weights = make_weights(num_rel=len(rel2id), vocab_size=len(vocab), pcnn=pcnn)
    return vocab, weights
