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


def _shaped_instances(spark, schema: str, n: int = 40):
    """Instance rows on a named multilabel schema: in-vocab,
    pairwise-distinct texts; every third row carries a 1-2 relation
    `anno_relation_list` (the NYT10m manual-test shape), the rest fall
    back to their single label_id."""
    rel2id = relations.rel2id_for(schema)
    names = sorted(rel2id, key=rel2id.get)
    rng = random.Random(7)
    gaz = relations.gazetteer()
    tpls = [t[3] for t in relations.POSITIVE_TEMPLATES]
    rows = []
    for i in range(n):
        label = rng.randrange(len(rel2id))
        h = gaz[i % len(gaz)][1]
        t = gaz[(i * 7 + 3) % len(gaz)][1]
        text = tpls[i % len(tpls)].format(h=h, t=t)
        hb = text.index(h)
        tb = text.index(t, hb + len(h))
        anno = (
            sorted(rng.sample(names[1:], rng.randrange(1, 3)))
            if i % 3 == 0
            else None
        )
        rows.append(
            (text, hb, hb + len(h), tb, tb + len(t),
             f"e{i}", f"p{i}", label, f"c{i % 5}", i % 11, anno)
        )
    return spark.createDataFrame(
        rows,
        "text string, h_begin int, h_end int, t_begin int, t_end int, "
        "h_id string, t_id string, label_id int, conv_id string, "
        "turn_idx int, anno_relation_list array<string>",
    )


@pytest.mark.parametrize("schema,n_labels", [
    ("nyt10m_shaped", 25),
    ("wiki20m_shaped", 81),
])
def test_shaped_multilabel_end_to_end(spark, schema, n_labels):
    """The engine-native multilabel benchmark SHAPES — nyt10m-shaped
    (25 labels) and wiki20m-shaped (NA + the 80 wiki80 properties);
    the real rel2id files are reference runtime downloads
    (pretrain.py:36-65) — run the full multilabel dataset shape end to
    end: instances where some rows carry `anno_relation_list`
    (data_loader.py:393-397) and the rest fall back to their single
    label_id, through the production sigmoid scoring + ckpt roundtrip
    + A10 evaluator (evaluate_multilabel), equal to the reference-math
    loop oracle on the same production score matrix."""
    from opennre_spark.functions.weights import default_model
    from opennre_spark.operators.scoring import score_instances
    from opennre_spark.operators.training import evaluate_multilabel

    rel2id = relations.rel2id_for(schema)
    assert len(rel2id) == n_labels and rel2id["NA"] == 0
    names = sorted(rel2id, key=rel2id.get)
    inst = _shaped_instances(spark, schema)
    _, W = default_model(schema=schema)
    got = evaluate_multilabel(inst, dict(W), schema=schema)

    # loop oracle over the SAME production scores (scoring parity has
    # its own tests; this one pins the anno-row eval semantics)
    scored = score_instances(
        inst, with_scores=True, classifier="sigmoid",
        schema=schema,
    ).collect()
    data, mat = [], []
    for r in scored:
        if r["anno_relation_list"] is not None:
            anno = list(r["anno_relation_list"])
            vec = [0] * len(rel2id)
            for rel in anno:
                vec[rel2id[rel]] = 1
            data.append(
                {"anno_relation_list": anno, "anno_relation_vec": vec}
            )
        else:
            data.append({"relation": names[r["label_id"]]})
        mat.append([float(s) for s in r["scores"]])
    want = om.oracle_multilabel_sentence_eval(
        data, np.array(mat, dtype=np.float64), rel2id
    )
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


# --------------------------------------------------------------------------
# Multi-label TRAINING (MultiLabelSentenceRE.train_model,
# multi_label_sentence_re.py:97-136): SigmoidNN + BCEWithLogits over
# the NA-dropped one-hot matrix
# --------------------------------------------------------------------------

import math

from opennre_spark.functions import grad_kernels as gk


def test_multilabel_bce_forward_matches_naive():
    """Kernel loss == a loop-computed BCEWithLogits mean over the
    flattened (B, N-1) matrix (logits and one-hot target both drop the
    NA column, multi_label_sentence_re.py:117-122)."""
    from tests.test_training import batch_arrays, tiny_bags, tiny_weights
    from opennre_spark.functions.kernels import softmax  # noqa: F401

    W = tiny_weights(np.float32)
    bags = tiny_bags(n_bags=6, max_members=1)
    token, pos1, pos2, _, labels = batch_arrays(bags)
    lw, ws, *_ = gk.multilabel_sentence_train_batch(
        token, pos1, pos2, labels, W
    )
    # naive: rep via the same loops oracle, then elementwise BCE
    from tests.oracle.train_loop import _naive_rep

    total, count = 0.0, 0
    for b in range(len(labels)):
        rep = _naive_rep(token[b], pos1[b], pos2[b], W)
        logits = W["fc_w"] @ rep + W["fc_b"]
        for j in range(1, logits.shape[0]):
            z = float(logits[j])
            y = 1.0 if labels[b] == j else 0.0
            total += max(z, 0.0) - z * y + math.log1p(math.exp(-abs(z)))
            count += 1
    assert math.isclose(lw / ws, total / count, rel_tol=1e-5)


def test_multilabel_train_kernel_fd_cnn():
    from tests.test_training import batch_arrays, tiny_bags, tiny_weights

    W = tiny_weights(np.float64)
    bags = tiny_bags(n_bags=4, max_members=1)  # one label per ROW
    token, pos1, pos2, _, labels = batch_arrays(bags)

    def run(w):
        return gk.multilabel_sentence_train_batch(token, pos1, pos2, labels, w)

    lw, ws, _, _, _, grads = run(W)

    def loss_fn(w):
        lw, ws, *_ = run(w)
        return lw / ws

    # reuse the CNN FD harness (skips the padding_idx=0 pos rows)
    from tests.test_training import _fd_check

    _fd_check(loss_fn, {k: grads[k] / ws for k in grads}, W)


def test_multilabel_train_kernel_fd_bert():
    """The same BCE step fine-tuning BERT through the encoder dispatch."""
    from tests.test_bert_training import (
        _fd_check_bert,
        tiny_batch,
        tiny_bert_weights,
    )

    W = tiny_bert_weights(np.float64)
    token, att_mask, pos1, pos2, labels = tiny_batch()

    def run(w):
        return gk.multilabel_sentence_train_batch(
            token, pos1.reshape(-1, 1), pos2.reshape(-1, 1), labels, w,
            mask=att_mask,
        )

    lw, ws, _, _, _, grads = run(W)

    def loss_fn(w):
        lw, ws, *_ = run(w)
        return lw / ws

    _fd_check_bert(loss_fn, {k: grads[k] / ws for k in grads}, W)


def test_distributed_multilabel_matches_serial(spark):
    from tests.oracle.train_loop import serial_train_sentences
    from tests.test_training import _labeled_instances

    from opennre_spark.functions.weights import default_model
    from opennre_spark.operators.training import (
        _SORT_COLS,
        encode_labeled,
        sentence_batch_col,
        train_sentence_model,
    )

    inst = _labeled_instances(spark, n=24)
    _, W0 = default_model(schema="reduced")
    epochs, batch_size, lr, wd, seed = 2, 8, 0.2, 1e-4, 37

    W_dist, hist_dist = train_sentence_model(
        inst, epochs=epochs, batch_size=batch_size, lr=lr,
        weight_decay=wd, seed=seed, init_weights=W0, multilabel=True,
    )
    encoded = encode_labeled(inst)
    n_inst = encoded.count()
    n_batches = max(1, int(np.ceil(n_inst / batch_size)))
    sort_cols = [c for c in _SORT_COLS if c in inst.columns]
    schedule = []
    for epoch in range(epochs):
        rows = encoded.withColumn(
            "__batch", sentence_batch_col(epoch, n_batches, seed, sort_cols)
        ).collect()
        batches = [[] for _ in range(n_batches)]
        for r in rows:
            batches[r["__batch"]].append(
                (
                    np.asarray(r["token"], dtype=np.int64),
                    np.asarray(r["pos1"], dtype=np.int64),
                    np.asarray(r["pos2"], dtype=np.int64),
                    int(r["label_id"]),
                )
            )
        schedule.append(batches)
    W_ser, hist_ser = serial_train_sentences(
        schedule, dict(W0), lr, wd, multilabel=True
    )
    for hd, hs in zip(hist_dist, hist_ser):
        assert math.isclose(hd["avg_loss"], hs["avg_loss"], rel_tol=1e-6)
        assert math.isclose(hd["avg_acc"], hs["avg_acc"], rel_tol=1e-9)
    for k in gk.PARAM_KEYS:
        np.testing.assert_allclose(W_dist[k], W_ser[k], rtol=0, atol=2e-6)


def test_multilabel_val_and_ckpt(spark, tmp_path):
    """Per-epoch multilabel validation through the production sigmoid
    scoring path + best-ckpt save: the reloaded checkpoint re-evaluates
    to exactly the best recorded elementwise accuracy
    (multi_label_sentence_re.py:138-146 save-on-best semantics)."""
    from tests.test_training import _labeled_instances

    from opennre_spark.functions.weights import default_model, load_state_dict_npz
    from opennre_spark.operators.training import (
        evaluate_multilabel,
        train_sentence_model,
    )

    inst = _labeled_instances(spark, n=24)
    _, W0 = default_model(schema="reduced")
    ckpt = str(tmp_path / "best_ml.npz")
    _, hist = train_sentence_model(
        inst, epochs=2, batch_size=12, lr=0.3, weight_decay=1e-5,
        seed=41, init_weights=W0, multilabel=True, val_instances=inst,
        ckpt=ckpt,
    )
    vals = [h["val_acc"] for h in hist]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert hist[-1]["avg_loss"] < hist[0]["avg_loss"]
    loaded = load_state_dict_npz(ckpt)
    res = evaluate_multilabel(inst, loaded)
    assert math.isclose(res["acc"], max(vals), rel_tol=1e-12)


def test_multilabel_training_on_shaped_schema(spark, tmp_path):
    """MultiLabelSentenceRE.train_model on a NAMED benchmark shape:
    the nyt10m-shaped 25-label schema, trained on single-label rows
    (the reference trains on distant labels and reserves
    anno_relation_list for the manual test set) with per-epoch
    validation over anno-bearing instances through the production
    sigmoid path, best-ckpt save, and a reload that re-evaluates to
    the recorded best — the last dataset-shape x training-framework
    combination run end to end."""
    from opennre_spark.functions.weights import (
        default_model,
        load_state_dict_npz,
    )
    from opennre_spark.operators.training import (
        evaluate_multilabel,
        train_sentence_model,
    )

    schema = "nyt10m_shaped"
    inst = _shaped_instances(spark, schema, n=30)
    _, W0 = default_model(schema=schema)
    ckpt = str(tmp_path / "best_ml_shaped.npz")
    _, hist = train_sentence_model(
        inst, epochs=2, batch_size=15, lr=0.3, weight_decay=1e-5,
        seed=3, init_weights=W0, multilabel=True, schema=schema,
        val_instances=inst, ckpt=ckpt,
    )
    assert hist[-1]["avg_loss"] < hist[0]["avg_loss"]
    vals = [h["val_acc"] for h in hist]
    assert all(0.0 <= v <= 1.0 for v in vals)
    loaded = load_state_dict_npz(ckpt)
    res = evaluate_multilabel(inst, loaded, schema=schema)
    assert math.isclose(res["acc"], max(vals), rel_tol=1e-12)


def test_multilabel_loss_weight_raises(spark):
    from tests.test_training import _labeled_instances
    from opennre_spark.operators.training import train_sentence_model

    inst = _labeled_instances(spark, n=8)
    with pytest.raises(ValueError, match="multilabel"):
        train_sentence_model(inst, multilabel=True, loss_weight=True)
