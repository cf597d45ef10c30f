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


def test_rel2id_alignment_permutes_fc_rows(tmp_path):
    """An export whose rel2id ID ORDER differs from the engine fixture
    must land with classifier rows realigned — the silent-mislabel bug
    class (ADVICE r2): count-only validation would accept permuted rows.
    """
    import json

    base = dict(np.load(CKPT))
    rel2id = relations.rel2id_for("reduced")
    names = sorted(rel2id, key=rel2id.get)
    # reversed id order: ckpt row k holds relation names[-1-k]
    ckpt_rel2id = {name: len(names) - 1 - i for i, name in enumerate(names)}
    base["fc.weight"] = base["fc.weight"][::-1].copy()
    base["fc.bias"] = base["fc.bias"][::-1].copy()
    base["__rel2id__"] = np.str_(json.dumps(ckpt_rel2id))
    p = tmp_path / "permuted.npz"
    np.savez(p, **base)
    want = load_state_dict_npz(CKPT)
    got = load_state_dict_npz(str(p), rel2id=rel2id)
    np.testing.assert_array_equal(got["fc_w"], want["fc_w"])
    np.testing.assert_array_equal(got["fc_b"], want["fc_b"])
    # label-SET mismatch fails fast instead of silently mislabeling
    bad = dict(ckpt_rel2id)
    bad["not_a_relation"] = bad.pop(names[0])
    base["__rel2id__"] = np.str_(json.dumps(bad))
    p2 = tmp_path / "badset.npz"
    np.savez(p2, **base)
    with pytest.raises(ValueError, match="label set"):
        load_state_dict_npz(str(p2), rel2id=rel2id)


BERT_CKPT = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "ckpt_reduced_bert.npz"
)

# frozen once from the checked-in seed-5353 fixture
# (tools/make_bert_ckpt_fixture.py) — proves the BERT loader loaded
# rather than fell back to the seed-1234 defaults
BERT_GOLDEN = ("employee_of", 0.17515631020069122)


def test_bert_loader_maps_and_transposes():
    from opennre_spark.functions.bert_kernels import load_bert_state_dict_npz

    W = load_bert_state_dict_npz(BERT_CKPT)
    assert (int(W["hidden"]), int(W["layers"]), int(W["heads"])) == (128, 4, 4)
    # HF stores nn.Linear as (out, in); our forward wants x @ W. The
    # intermediate/output dense pair is asymmetric, so these shapes fail
    # if the loader skips the transpose.
    assert W["l0_i_w"].shape == (128, 512)
    assert W["l0_f_w"].shape == (512, 128)
    assert W["pool_w"].shape == (128, 128)
    raw = np.load(BERT_CKPT)
    np.testing.assert_array_equal(
        W["l2_i_w"],
        raw["sentence_encoder.bert.encoder.layer.2.intermediate.dense.weight"].T,
    )


def test_bert_golden_score_from_ckpt():
    from opennre_spark.functions import kernels
    from opennre_spark.functions.bert_encoding import bert_encode_batch
    from opennre_spark.functions.bert_kernels import bert_cls_rep, default_bert_model

    vocab, W = default_bert_model(schema="reduced", ckpt=BERT_CKPT)
    enc = bert_encode_batch(
        [GOLDEN_ITEM["text"]],
        np.array([GOLDEN_ITEM["h"]["pos"][0]]),
        np.array([GOLDEN_ITEM["h"]["pos"][1]]),
        np.array([GOLDEN_ITEM["t"]["pos"][0]]),
        np.array([GOLDEN_ITEM["t"]["pos"][1]]),
        vocab,
        64,
    )
    rep = bert_cls_rep(enc["token"], enc["att_mask"], enc["pos1"], enc["pos2"], W)
    pr = kernels.softmax(rep @ W["fc_w"].T + W["fc_b"], axis=-1)
    i = int(pr.argmax())
    assert relations.ID2REL[i] == BERT_GOLDEN[0]
    assert abs(float(pr[0, i]) - BERT_GOLDEN[1]) < 1e-6
    # genuinely different decisions than the seed-frozen fallback
    _, W0 = default_bert_model(schema="reduced")
    assert not np.allclose(W["fc_w"], W0["fc_w"])


def test_bert_entity_loader_roundtrip(tmp_path):
    """The entity encoder adds sentence_encoder.linear (bert_encoder.py:
    121, consumed as x @ W.T so HF layout stays untransposed) and an fc
    sized 2H; exercise that branch with a temp export derived from the
    checked-in fixture."""
    from opennre_spark.functions.bert_kernels import load_bert_state_dict_npz

    base = dict(np.load(BERT_CKPT))
    rng = np.random.default_rng(7)
    H = 128
    rel = base["fc.weight"].shape[0]
    base["sentence_encoder.linear.weight"] = rng.standard_normal(
        (2 * H, 2 * H)
    ).astype(np.float32)
    base["sentence_encoder.linear.bias"] = np.zeros(2 * H, np.float32)
    base["fc.weight"] = rng.standard_normal((rel, 2 * H)).astype(np.float32)
    p = tmp_path / "bert_entity.npz"
    np.savez(p, **base)
    W = load_bert_state_dict_npz(str(p), entity=True)
    np.testing.assert_array_equal(
        W["ent_w"], base["sentence_encoder.linear.weight"]
    )
    assert W["fc_w"].shape == (rel, 2 * H)


def test_bert_ckpt_through_spark_pipeline(spark):
    """extract_triples(encoder='bert', ckpt=) must change decisions vs
    the fallback weights and agree with the direct kernel run."""
    from opennre_spark.pipeline import extract_triples
    from opennre_spark.sources.transcripts import transcripts_df

    transcripts = transcripts_df(spark, 6).cache()
    got = {
        (r.subj, r.pred, r.obj)
        for r in extract_triples(
            transcripts, mode="sentence", encoder="bert", ckpt=BERT_CKPT
        ).collect()
    }
    base = {
        (r.subj, r.pred, r.obj)
        for r in extract_triples(
            transcripts, mode="sentence", encoder="bert"
        ).collect()
    }
    assert got, "bert ckpt pipeline emitted no triples"
    assert got != base, "ckpt weights must actually change the decisions"
    transcripts.unpersist()


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


def test_export_tool_heads_table_matches_loader():
    """tools/export_ckpt.py keeps a standalone copy of the HF
    hidden->heads table (the export machine has torch but not this
    repo); it must stay identical to the loader's
    bert_kernels._HF_STANDARD_HEADS or exporter and loader disagree
    about which checkpoints need an explicit --heads."""
    import importlib.util
    import os

    from opennre_spark.functions.bert_kernels import _HF_STANDARD_HEADS

    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "export_ckpt.py")
    spec = importlib.util.spec_from_file_location("export_ckpt", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.HF_STANDARD_HEADS == _HF_STANDARD_HEADS
