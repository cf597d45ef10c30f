"""S4 checkpoint source: load an exported .npz state dict and reproduce
a frozen golden score — the drop-in path that would reproduce the
reference golden ('father', 0.7500484585762024,
/root/reference/tests/test_inference.py:8-11) if the real
wiki80_cnn_softmax ckpt were exported with tools/export_ckpt.py.

fixtures/ckpt_reduced_cnn.npz stores seed-4242 weights (NOT the engine's
default seed 42) under the reference's state-dict key names
(sentence_encoder.word_embedding.weight, ..., fc.weight), so a passing
golden here proves the loader actually loaded rather than fell back."""

import os

import numpy as np
import pytest

from opennre_spark import relations
from opennre_spark.functions.weights import (
    build_vocab,
    default_model,
    load_state_dict_npz,
    make_weights,
)

CKPT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "ckpt_reduced_cnn.npz")

# frozen once from the checked-in fixture (reference golden-test shape,
# tests/test_inference.py:8-11; tolerance 1e-6 per the reference)
GOLDEN_ITEM = {
    "text": "Ada Moreno founded Helix Dynamics back in 1998.",
    "h": {"pos": [0, 10]},
    "t": {"pos": [19, 33]},
}
GOLDEN = ("born_in", 0.19313184916973114)


def test_loader_maps_state_dict_keys():
    W = load_state_dict_npz(CKPT)
    assert set(W) >= {"word_emb", "pos1_emb", "pos2_emb", "conv_w", "conv_b",
                      "fc_w", "fc_b", "att_diag", "max_length", "pcnn"}
    assert int(W["max_length"]) == 40
    assert not bool(W["pcnn"])
    # genuinely different weights than the seed-42 fallback
    fallback = make_weights(
        num_rel=W["fc_w"].shape[0], vocab_size=W["word_emb"].shape[0]
    )
    assert not np.allclose(W["fc_w"], fallback["fc_w"])


def test_golden_score_from_ckpt():
    from tests.oracle import reference_math as om

    vocab = build_vocab(relations.vocabulary_words())
    W = load_state_dict_npz(CKPT)
    rel, score = om.oracle_infer(GOLDEN_ITEM, vocab, W, relations.ID2REL, 40)
    assert rel == GOLDEN[0]
    assert abs(float(score) - GOLDEN[1]) < 1e-6


def test_default_model_ckpt_route_and_validation():
    vocab, W = default_model(schema="reduced", ckpt=CKPT)
    assert W["word_emb"].shape[0] == len(vocab)
    # schema mismatch fails fast (8-relation ckpt vs 80-relation schema)
    with pytest.raises(ValueError, match="relations"):
        default_model(schema="wiki80", ckpt=CKPT)
    with pytest.raises(ValueError, match="pcnn"):
        default_model(pcnn=True, schema="reduced", ckpt=CKPT)


def test_ckpt_through_spark_pipeline(spark):
    """End-to-end: extract_triples with ckpt= must equal the loop oracle
    running the loaded weights — and differ from the seed-42 triples."""
    from opennre_spark.operators.candidates import candidate_pairs
    from opennre_spark.operators.mentions import detect_mentions
    from opennre_spark.pipeline import extract_triples, na_rel_id
    from opennre_spark.sources.transcripts import transcripts_df
    from tests.oracle import reference_math as om

    transcripts = transcripts_df(spark, 10).cache()
    mentions = detect_mentions(transcripts, relations.gazetteer())
    instances = candidate_pairs(mentions).collect()
    vocab = build_vocab(relations.vocabulary_words())
    W = load_state_dict_npz(CKPT)
    neg = na_rel_id(relations.REL2ID)
    want = set()
    for r in instances:
        item = {"text": r.text, "h": {"pos": [r.h_begin, r.h_end]},
                "t": {"pos": [r.t_begin, r.t_end]}}
        rel, _ = om.oracle_infer(item, vocab, W, relations.ID2REL, 40)
        if relations.REL2ID[rel] != neg:
            want.add((r.h_id, rel, r.t_id))
    got = {
        (r.subj, r.pred, r.obj)
        for r in extract_triples(transcripts, mode="sentence", ckpt=CKPT).collect()
    }
    assert got == want
    base = {
        (r.subj, r.pred, r.obj)
        for r in extract_triples(transcripts, mode="sentence").collect()
    }
    assert got != base, "ckpt weights must actually change the decisions"
    transcripts.unpersist()
