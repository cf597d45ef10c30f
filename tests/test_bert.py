"""BERT path parity (T9-T12, T15, M4, M5): vectorized production vs the
loop oracle, plus end-to-end through the Spark scoring operator."""

import numpy as np
import pytest

from opennre_spark import relations
from opennre_spark.functions import bert_kernels
from opennre_spark.functions.bert_encoding import bert_encode_batch
from opennre_spark.functions.bert_tokenization import (
    basic_tokenize,
    bert_tokenize,
    build_wordpiece_vocab,
    wordpiece,
)
from tests.oracle import bert_math as ob

L = 64

INSTANCES = [
    {"text": "Ada Moreno founded Helix Dynamics back in 1998.",
     "h": {"pos": [0, 10]}, "t": {"pos": [19, 33]}},
    {"text": "Helix Dynamics was founded by Ada Moreno.",
     "h": {"pos": [30, 40]}, "t": {"pos": [0, 14]}},  # rev path
    {"text": "Zzyx-Qrf!! met Ada Moreno... (allegedly)",
     "h": {"pos": [15, 25]}, "t": {"pos": [0, 8]}},
    {"text": "B. Gates co-founded a thing; Ada Moreno watched.",
     "h": {"pos": [0, 8]}, "t": {"pos": [29, 39]}},
]


@pytest.fixture(scope="module")
def model():
    return bert_kernels.default_bert_model()


def test_tokenizer_parity(model):
    vocab, _ = model
    texts = [i["text"] for i in INSTANCES] + [
        "Åccénted WORDS and [CLS] never-split?",
        "中文 chars get split 中",
        "",
        "   punctuation!!! only...",
    ]
    for t in texts:
        assert basic_tokenize(t) == ob.oracle_basic_tokenize(t), t
        assert bert_tokenize(t, vocab) == ob.oracle_bert_tokenize(t, vocab), t


def test_wordpiece_longest_match(model):
    vocab, _ = model
    # 'founded' is in-vocab whole; an unseen word falls to char pieces
    assert wordpiece(["founded"], vocab) == ["founded"]
    pieces = wordpiece(["foundedx"], vocab)
    assert pieces[0] == "founded" and all(p.startswith("##") for p in pieces[1:])
    assert wordpiece(["x" * 201], vocab) == ["[UNK]"]


def test_encode_parity(model):
    vocab, _ = model
    enc = bert_encode_batch(
        [i["text"] for i in INSTANCES],
        [i["h"]["pos"][0] for i in INSTANCES],
        [i["h"]["pos"][1] for i in INSTANCES],
        [i["t"]["pos"][0] for i in INSTANCES],
        [i["t"]["pos"][1] for i in INSTANCES],
        vocab, L,
    )
    for i, item in enumerate(INSTANCES):
        tok, att, p1, p2 = ob.oracle_bert_encode(item, vocab, L)
        np.testing.assert_array_equal(enc["token"][i], tok[0], err_msg=str(i))
        np.testing.assert_array_equal(enc["att_mask"][i], att[0], err_msg=str(i))
        assert enc["pos1"][i] == p1 and enc["pos2"][i] == p2


@pytest.mark.parametrize("entity", [False, True])
def test_bert_infer_parity(entity):
    vocab, W = bert_kernels.default_bert_model(entity=entity)
    enc = bert_encode_batch(
        [i["text"] for i in INSTANCES],
        [i["h"]["pos"][0] for i in INSTANCES],
        [i["h"]["pos"][1] for i in INSTANCES],
        [i["t"]["pos"][0] for i in INSTANCES],
        [i["t"]["pos"][1] for i in INSTANCES],
        vocab, L,
    )
    rep_fn = bert_kernels.bert_entity_rep if entity else bert_kernels.bert_cls_rep
    rep = rep_fn(enc["token"], enc["att_mask"], enc["pos1"], enc["pos2"], W)
    logits = rep @ W["fc_w"].T + W["fc_b"]
    from opennre_spark.functions.kernels import softmax

    probs = softmax(logits, axis=-1)
    for i, item in enumerate(INSTANCES):
        rel, score = ob.oracle_bert_infer(
            item, vocab, W, relations.ID2REL, L, entity=entity
        )
        assert relations.ID2REL[int(probs[i].argmax())] == rel, i
        assert abs(float(probs[i].max()) - score) < 2e-5, i


def test_bert_scoring_through_spark(spark):
    from opennre_spark.operators.candidates import candidate_pairs
    from opennre_spark.operators.mentions import detect_mentions
    from opennre_spark.operators.scoring import score_instances
    from opennre_spark.sources.transcripts import transcripts_df

    t = transcripts_df(spark, 6)
    instances = candidate_pairs(detect_mentions(t, relations.gazetteer()))
    rows = score_instances(instances, encoder="bert").collect()
    assert rows
    vocab, W = bert_kernels.default_bert_model()
    inst = {
        (r.conv_id, r.turn_idx, r.pair_turn_idx, r.h_id, r.t_id, r.h_begin, r.t_begin): r
        for r in instances.collect()
    }
    for r in rows[:20]:
        src = inst[(r.conv_id, r.turn_idx, r.pair_turn_idx, r.h_id, r.t_id, r.h_begin, r.t_begin)]
        item = {"text": src.text, "h": {"pos": [src.h_begin, src.h_end]},
                "t": {"pos": [src.t_begin, src.t_end]}}
        rel, score = ob.oracle_bert_infer(item, vocab, W, relations.ID2REL, L)
        assert relations.ID2REL[r.pred_rel_id] == rel
        assert abs(r.pred_score - score) < 2e-5
