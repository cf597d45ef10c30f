"""Independent, loop-style re-derivation of the reference's math, used
as the pytest parity oracle (SURVEY.md §5: "parity is against *our*
re-run of reference math"). Written directly from reading the reference
sources (citations inline), deliberately structured differently from the
production code in opennre_spark/ (per-char/per-step loops here,
vectorized batches there) so a bug in one side cannot hide in the other.

This module mirrors the reference order of operations exactly:
tokenize (utils.py:85-132,186-202; word_tokenizer.py:39-64), encode
(base_encoder.py:84-154; pcnn_encoder.py:155-172), CNN/PCNN forward
(cnn_encoder.py:46-65; pcnn_encoder.py:54-80), classify
(softmax_nn.py:28-54), bag aggregate (bag_attention.py:136-164,
bag_average.py:117-131, bag_one.py:140-148), eval metrics
(data_loader.py:53-103, 239-310).
"""

from __future__ import annotations

import unicodedata

import numpy as np


# --- tokenization ----------------------------------------------------

def _is_whitespace(ch):
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch):
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_cjk(cp):
    return (
        (0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
        or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
        or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
        or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F)
    )


def oracle_tokenize(text: str) -> list[str]:
    # clean_text (utils.py:85-95)
    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        cleaned.append(" " if _is_whitespace(ch) else ch)
    s = "".join(cleaned)
    # tokenize_chinese_chars (utils.py:121-132)
    padded = []
    for ch in s:
        if _is_cjk(ord(ch)):
            padded.extend([" ", ch, " "])
        else:
            padded.append(ch)
    s = "".join(padded)
    # split_on_whitespace (utils.py:97-104)
    s = s.strip()
    return s.split() if s else []


def oracle_ids(tokens, vocab, max_seq_length, blank_id, unk_id):
    # convert_by_vocab, uncased=True (utils.py:186-202)
    out = []
    for tok in tokens:
        tok = tok.lower()
        out.append(vocab[tok] if tok in vocab else unk_id)
    if len(out) > max_seq_length:
        out = out[:max_seq_length]
    else:
        while len(out) < max_seq_length:
            out.append(blank_id)
    return out


# --- instance encoding (base_encoder.py:84-154) ----------------------

def oracle_encode(item, vocab, max_length, pad_id, unk_id, with_mask=False):
    sentence = item["text"]
    pos_head = list(item["h"]["pos"])
    pos_tail = list(item["t"]["pos"])
    if pos_head[0] > pos_tail[0]:
        pos_min, pos_max = pos_tail, pos_head
        rev = True
    else:
        pos_min, pos_max = pos_head, pos_tail
        rev = False
    sent_0 = oracle_tokenize(sentence[: pos_min[0]])
    sent_1 = oracle_tokenize(sentence[pos_min[1] : pos_max[0]])
    sent_2 = oracle_tokenize(sentence[pos_max[1] :])
    ent_0 = oracle_tokenize(sentence[pos_min[0] : pos_min[1]])
    ent_1 = oracle_tokenize(sentence[pos_max[0] : pos_max[1]])
    tokens = sent_0 + ent_0 + sent_1 + ent_1 + sent_2
    if rev:
        pos_tail = [len(sent_0), len(sent_0) + len(ent_0)]
        pos_head = [
            len(sent_0) + len(ent_0) + len(sent_1),
            len(sent_0) + len(ent_0) + len(sent_1) + len(ent_1),
        ]
    else:
        pos_head = [len(sent_0), len(sent_0) + len(ent_0)]
        pos_tail = [
            len(sent_0) + len(ent_0) + len(sent_1),
            len(sent_0) + len(ent_0) + len(sent_1) + len(ent_1),
        ]
    indexed = oracle_ids(tokens, vocab, max_length, pad_id, unk_id)
    pos1, pos2 = [], []
    pos1_in_index = min(pos_head[0], max_length)
    pos2_in_index = min(pos_tail[0], max_length)
    for i in range(len(tokens)):
        pos1.append(min(i - pos1_in_index + max_length, 2 * max_length - 1))
        pos2.append(min(i - pos2_in_index + max_length, 2 * max_length - 1))
    while len(pos1) < max_length:
        pos1.append(0)
    while len(pos2) < max_length:
        pos2.append(0)
    indexed = indexed[:max_length]
    pos1 = pos1[:max_length]
    pos2 = pos2[:max_length]
    out = {
        "token": np.array([indexed]),
        "pos1": np.array([pos1]),
        "pos2": np.array([pos2]),
    }
    if with_mask:
        # pcnn_encoder.py:155-170
        mask = []
        mn = min(pos1_in_index, pos2_in_index)
        mx = max(pos1_in_index, pos2_in_index)
        for i in range(len(tokens)):
            if i <= mn:
                mask.append(1)
            elif i <= mx:
                mask.append(2)
            else:
                mask.append(3)
        while len(mask) < max_length:
            mask.append(0)
        out["mask"] = np.array([mask[:max_length]])
    return out


# --- forward math, different decomposition than production ------------

def oracle_conv(x, w, b):
    """Conv1d kernel-offset decomposition: out[:, t, h] =
    sum_k sum_c xpad[:, t+k, c] * w[h, c, k] + b[h] (cnn_encoder.py:43).
    """
    B, L, C = x.shape
    H, _, K = w.shape
    pad = (K - 1) // 2
    xp = np.zeros((B, L + 2 * pad, C), dtype=np.float32)
    xp[:, pad : pad + L, :] = x
    out = np.zeros((B, L, H), dtype=np.float32)
    for k in range(K):
        out += xp[:, k : k + L, :] @ w[:, :, k].T.astype(np.float32)
    return out + b


def oracle_softmax(x):
    m = np.max(x, axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def oracle_cnn_rep(enc, W):
    x = np.concatenate(
        [
            W["word_emb"][enc["token"]],
            W["pos1_emb"][enc["pos1"]],
            W["pos2_emb"][enc["pos2"]],
        ],
        axis=2,
    )
    c = oracle_conv(x, W["conv_w"], W["conv_b"])
    return np.maximum(c, 0).max(axis=1)


def oracle_pcnn_rep(enc, W):
    x = np.concatenate(
        [
            W["word_emb"][enc["token"]],
            W["pos1_emb"][enc["pos1"]],
            W["pos2_emb"][enc["pos2"]],
        ],
        axis=2,
    )
    c = oracle_conv(x, W["conv_w"], W["conv_b"])  # (B, L, H)
    B, L, H = c.shape
    reps = np.zeros((B, 3 * H), dtype=np.float32)
    for b in range(B):
        for seg in (1, 2, 3):
            shifted = c[b] + np.float32(-100.0) * (
                1.0 - (enc["mask"][b] == seg).astype(np.float32)
            )[:, None]
            reps[b, (seg - 1) * H : seg * H] = np.maximum(shifted, 0).max(axis=0)
    return reps


def oracle_infer(item, vocab, W, id2rel, max_length, pcnn=False):
    """SoftmaxNN.infer (softmax_nn.py:28-39): (relation_name, score)."""
    pad_id = vocab["[PAD]"]
    unk_id = vocab["[UNK]"]
    enc = oracle_encode(item, vocab, max_length, pad_id, unk_id, with_mask=pcnn)
    rep = oracle_pcnn_rep(enc, W) if pcnn else oracle_cnn_rep(enc, W)
    logits = rep @ W["fc_w"].T + W["fc_b"]
    probs = oracle_softmax(logits)[0]
    pred = int(np.argmax(probs))
    return id2rel[pred], float(probs[pred])


# --- bag aggregators (eval, bag_size=0) -------------------------------

def oracle_bag_att(rep, W):
    """bag_attention.py:152-164, per-relation loop."""
    fc_w, fc_b, diag = W["fc_w"], W["fc_b"], W["att_diag"]
    N = fc_w.shape[0]
    att_mat = fc_w.T * diag[:, None]
    att_score = rep @ att_mat  # (n, N)
    out = np.zeros(N, dtype=np.float32)
    for r in range(N):
        sm = oracle_softmax(att_score[:, r][None, :])[0]  # softmax over bag
        rep_r = sm @ rep  # (H,)
        logits = rep_r @ fc_w.T + fc_b
        out[r] = oracle_softmax(logits[None, :])[0][r]
    return out


def oracle_bag_avg(rep, W):
    bag_rep = rep.mean(axis=0)
    logits = bag_rep @ W["fc_w"].T + W["fc_b"]
    return oracle_softmax(logits[None, :])[0]


def oracle_bag_one(probs):
    N = probs.shape[1]
    return np.array([probs[:, r].max() for r in range(N)], dtype=np.float32)


# --- eval metrics (data_loader.py:239-310, no sklearn dependency) -----

def oracle_bag_eval(pred_result, facts, rel2id, threshold=0.5):
    """pred_result: list of {'entpair': (h, t), 'relation': r, 'score': s}.
    facts: set of (h, t, r). Returns the curve metrics subset we parity-
    test (prec, rec, auc, max_micro_f1, p@k when defined).
    sklearn.metrics.auc == trapezoid over (rec, prec) in sorted order.
    """
    spr = sorted(pred_result, key=lambda x: x["score"], reverse=True)
    prec, rec = [], []
    correct = 0
    total = len(facts)
    for i, item in enumerate(spr):
        if (item["entpair"][0], item["entpair"][1], item["relation"]) in facts:
            correct += 1
        prec.append(correct / (i + 1))
        rec.append(correct / total)
    auc = 0.0
    for i in range(1, len(rec)):
        auc += (rec[i] - rec[i - 1]) * (prec[i] + prec[i - 1]) / 2.0
    np_prec = np.array(prec)
    np_rec = np.array(rec)
    f1 = 2 * np_prec * np_rec / (np_prec + np_rec + 1e-20)
    out = {
        "prec": np_prec,
        "rec": np_rec,
        "auc": auc,
        "max_micro_f1": float(f1.max()),
        "best_threshold": float(spr[int(f1.argmax())]["score"]),
        "mean_prec": float(np_prec.mean()),
    }
    for k in (100, 200, 300):
        if len(np_prec) >= k:
            out[f"p@{k}"] = float(np_prec[k - 1])
    return out


def oracle_sentence_eval(golds, preds, rel2id):
    """data_loader.py:53-103: acc + micro P/R/F1 with NA exclusion."""
    neg = -1
    for name in ["NA", "na", "no_relation", "Other", "Others"]:
        if name in rel2id:
            neg = rel2id[name]
            break
    correct = correct_positive = pred_positive = gold_positive = 0
    for g, p in zip(golds, preds):
        if g == p:
            correct += 1
            if g != neg:
                correct_positive += 1
        if g != neg:
            gold_positive += 1
        if p != neg:
            pred_positive += 1
    acc = correct / len(golds)
    micro_p = correct_positive / pred_positive if pred_positive else 0
    micro_r = correct_positive / gold_positive if gold_positive else 0
    micro_f1 = (
        2 * micro_p * micro_r / (micro_p + micro_r) if (micro_p + micro_r) else 0
    )
    return {"acc": acc, "micro_p": micro_p, "micro_r": micro_r, "micro_f1": micro_f1}


def oracle_entpair_f1(pred_result, facts, rel2id, threshold=0.5):
    """data_loader.py:256-304 entpair label/pred matrices + sklearn
    micro/macro over labels=range(1, N) (NA=0 excluded), re-derived
    with explicit loops (no sklearn in this sandbox).
    """
    entpair = {}
    for item in pred_result:
        key = (item["entpair"][0], item["entpair"][1])
        cell = entpair.setdefault(key, {})
        r = item["relation"]
        rec = cell.setdefault(r, {"label": 0, "pred": 0})
        if (key[0], key[1], r) in facts:
            rec["label"] = 1
        if item["score"] >= threshold:
            rec["pred"] = 1
    labels = [r for r, i in rel2id.items() if i != 0]
    tp = {r: 0 for r in labels}
    fp = {r: 0 for r in labels}
    fn = {r: 0 for r in labels}
    for key, cell in entpair.items():
        for r, rec in cell.items():
            if rec["label"] and rec["pred"]:
                tp[r] += 1
            elif rec["pred"] and not rec["label"]:
                fp[r] += 1
            elif rec["label"] and not rec["pred"]:
                fn[r] += 1
    TP, FP, FN = sum(tp.values()), sum(fp.values()), sum(fn.values())
    micro_p = TP / (TP + FP) if TP + FP else 0.0
    micro_r = TP / (TP + FN) if TP + FN else 0.0
    micro_f1 = 2 * micro_p * micro_r / (micro_p + micro_r) if micro_p + micro_r else 0.0
    macro_sum = 0.0
    for r in labels:
        p = tp[r] / (tp[r] + fp[r]) if tp[r] + fp[r] else 0.0
        rr = tp[r] / (tp[r] + fn[r]) if tp[r] + fn[r] else 0.0
        macro_sum += 2 * p * rr / (p + rr) if p + rr else 0.0
    macro_f1 = macro_sum / len(labels) if labels else 0.0
    return {
        "micro_p": micro_p,
        "micro_r": micro_r,
        "micro_f1": micro_f1,
        "macro_f1": macro_f1,
    }


def oracle_multilabel_sentence_eval(data, pred_score, rel2id, threshold=0.5):
    """data_loader.py:383-446 transliteration (sklearn-free): data is a
    list of {'relation': r} or {'anno_relation_list': [...],
    'anno_relation_vec': one-hot}; pred_score is (n, N)."""
    pred_score = np.asarray(pred_score)
    sorted_result = []
    total = 0
    NA = ["NA", "na", "N/A", "None", "none", "n/a", "no_relation"]
    for sent_id in range(len(data)):
        for rel in rel2id:
            if rel not in NA:
                sorted_result.append(
                    {"sent_id": sent_id, "relation": rel,
                     "score": pred_score[sent_id][rel2id[rel]]}
                )
                if "anno_relation_list" in data[sent_id]:
                    if rel in data[sent_id]["anno_relation_list"]:
                        total += 1
                elif rel == data[sent_id]["relation"]:
                    total += 1
    sorted_result.sort(key=lambda x: x["score"], reverse=True)
    prec, rec = [], []
    correct = 0
    for i, item in enumerate(sorted_result):
        d = data[item["sent_id"]]
        if "anno_relation_list" in d:
            if item["relation"] in d["anno_relation_list"]:
                correct += 1
        elif item["relation"] == d["relation"]:
            correct += 1
        prec.append(correct / (i + 1))
        rec.append(correct / total)
    auc = 0.0
    for i in range(1, len(rec)):
        auc += (rec[i] - rec[i - 1]) * (prec[i] + prec[i - 1]) / 2.0
    np_prec = np.array(prec)
    np_rec = np.array(rec)
    f1 = 2 * np_prec * np_rec / (np_prec + np_rec + 1e-20)

    N = len(rel2id)
    pred_vec = np.zeros((len(data), N), dtype=int)
    pred_vec[pred_score >= threshold] = 1
    label_vec = []
    for item in data:
        if "anno_relation_list" in item:
            label_vec.append(np.array(item["anno_relation_vec"], dtype=int))
        else:
            oh = np.zeros(N, dtype=int)
            oh[rel2id[item["relation"]]] = 1
            label_vec.append(oh)
    label_vec = np.stack(label_vec, 0)
    labels = list(range(1, N))
    tp = {r: int(((label_vec[:, r] == 1) & (pred_vec[:, r] == 1)).sum()) for r in labels}
    fp = {r: int(((label_vec[:, r] == 0) & (pred_vec[:, r] == 1)).sum()) for r in labels}
    fn = {r: int(((label_vec[:, r] == 1) & (pred_vec[:, r] == 0)).sum()) for r in labels}
    TP, FP, FN = sum(tp.values()), sum(fp.values()), sum(fn.values())
    micro_p = TP / (TP + FP) if TP + FP else 0.0
    micro_r = TP / (TP + FN) if TP + FN else 0.0
    micro_f1 = 2 * micro_p * micro_r / (micro_p + micro_r) if micro_p + micro_r else 0.0
    mp = mr = mf = 0.0
    for r in labels:
        p = tp[r] / (tp[r] + fp[r]) if tp[r] + fp[r] else 0.0
        rr = tp[r] / (tp[r] + fn[r]) if tp[r] + fn[r] else 0.0
        mp += p
        mr += rr
        mf += 2 * p * rr / (p + rr) if p + rr else 0.0
    n = len(labels)
    acc = float((label_vec == pred_vec).mean())
    out = {
        "acc": acc, "auc": auc,
        "max_micro_f1": float(f1.max()),
        "max_micro_f1_threshold": float(sorted_result[int(f1.argmax())]["score"]),
        "micro_p": micro_p, "micro_r": micro_r, "micro_f1": micro_f1,
        "macro_p": mp / n, "macro_r": mr / n, "macro_f1": mf / n,
    }
    for k in (100, 200, 300):
        if len(np_prec) >= k:
            out[f"p@{k}"] = float(np_prec[k - 1])
    return out
