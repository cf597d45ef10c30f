"""Multi-label sentence eval (data_loader.py:383-446) + SigmoidNN
scoring (sigmoid_nn.py): DataFrame plans vs loop oracle."""

import random

import numpy as np
import pytest

from opennre_spark import relations
from opennre_spark.operators.metrics import multilabel_sentence_eval
from tests.oracle import reference_math as om

N = len(relations.REL2ID)


@pytest.fixture(scope="module")
def fixture():
    rng = random.Random(23)
    data = []
    names = list(relations.REL2ID)
    pos_names = [r for r in names if r != "NA"]
    for i in range(80):
        if i % 3 == 0:  # annotated multi-label row
            anno = sorted(rng.sample(pos_names, rng.randrange(1, 3)))
            vec = [0] * N
            for r in anno:
                vec[relations.REL2ID[r]] = 1
            data.append({"anno_relation_list": anno, "anno_relation_vec": vec})
        else:
            data.append({"relation": names[rng.randrange(N)]})
    # distinct scores (tie-break order is a documented delta vs the
    # reference's stable insertion-order sort)
    scores = np.array(
        [[round(rng.random(), 9) for _ in range(N)] for _ in range(80)]
    )
    return data, scores


def test_multilabel_eval_parity(spark, fixture):
    data, scores = fixture
    rows = []
    for sid, item in enumerate(data):
        for rel, rid in relations.REL2ID.items():
            if "anno_relation_list" in item:
                label = 1 if rel in item["anno_relation_list"] else 0
            else:
                label = 1 if rel == item["relation"] else 0
            rows.append((sid, rel, float(scores[sid][rid]), label))
    cells = spark.createDataFrame(
        rows, "sent_id long, relation string, score double, label int"
    )
    got = multilabel_sentence_eval(cells, relations.REL2ID)
    want = om.oracle_multilabel_sentence_eval(data, scores, relations.REL2ID)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_sigmoid_scoring(spark):
    from opennre_spark.operators.candidates import candidate_pairs
    from opennre_spark.operators.mentions import detect_mentions
    from opennre_spark.operators.scoring import score_instances
    from opennre_spark.sources.transcripts import transcripts_df

    t = transcripts_df(spark, 6)
    inst = candidate_pairs(detect_mentions(t, relations.gazetteer()))
    sig = score_instances(inst, classifier="sigmoid", with_scores=True).collect()
    soft = score_instances(inst, with_scores=True).collect()
    assert len(sig) == len(soft) > 0
    for r in sig:
        # independent per-relation probabilities: no simplex constraint
        s = sum(r.scores)
        assert all(0.0 < v < 1.0 for v in r.scores)
        assert abs(s - 1.0) > 1e-6 or len(r.scores) == 1
    # monotone agreement: argmax is identical (sigmoid and softmax are
    # both monotone in the logit)
    key = lambda r: (r.conv_id, r.turn_idx, r.pair_turn_idx, r.h_id, r.t_id,
                     r.h_begin, r.t_begin)
    soft_by = {key(r): r.pred_rel_id for r in soft}
    for r in sig:
        assert soft_by[key(r)] == r.pred_rel_id
