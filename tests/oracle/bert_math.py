"""Loop-style oracle for the BERT path, derived directly from the
reference sources (basic_tokenizer.py:42-64, word_piece_tokenizer.py:
40-96, bert_encoder.py:35-103 + 23-33 + 123-143) and the standard BERT
layer equations — deliberately per-token / per-head loops vs the
vectorized production code in opennre_spark/functions/bert_*.
"""

from __future__ import annotations

import numpy as np

from .reference_math import oracle_tokenize

NEVER_SPLIT = ("[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]")


def _strip_accents(text):
    import unicodedata

    out = []
    for ch in unicodedata.normalize("NFD", text):
        if unicodedata.category(ch) != "Mn":
            out.append(ch)
    return "".join(out)


def _is_punct(ch):
    import unicodedata

    cp = ord(ch)
    if 33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126:
        return True
    return unicodedata.category(ch).startswith("P")


def _split_punct(token):
    out, buf = [], []
    for ch in token:
        if _is_punct(ch):
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(ch)
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def oracle_basic_tokenize(text):
    # basic_tokenizer.py:42-64
    split_tokens = []
    for token in oracle_tokenize(text):
        if token not in NEVER_SPLIT:
            token = _strip_accents(token.lower())
        split_tokens.extend(_split_punct(token))
    return split_tokens


def oracle_wordpiece(tokens, vocab, unk="[UNK]", max_chars=200):
    # word_piece_tokenizer.py:60-94
    out = []
    for chars in tokens:
        if len(chars) > max_chars:
            out.append(unk)
            continue
        is_bad = False
        start = 0
        subs = []
        while start < len(chars):
            end = len(chars)
            cur = None
            while start < end:
                sub = chars[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                is_bad = True
                break
            subs.append(cur)
            start = end
        out.extend([unk] if is_bad else subs)
    return out


def oracle_bert_tokenize(text, vocab):
    return oracle_wordpiece(oracle_basic_tokenize(text), vocab)


def oracle_bert_encode(item, vocab, max_length, mask_entity=False):
    # bert_encoder.py:42-103, direct transliteration
    sentence = item["text"]
    pos_head = list(item["h"]["pos"])
    pos_tail = list(item["t"]["pos"])
    pos_min, pos_max = pos_head, pos_tail
    rev = False
    if pos_head[0] > pos_tail[0]:
        pos_min, pos_max = pos_tail, pos_head
        rev = True
    sent0 = oracle_bert_tokenize(sentence[: pos_min[0]], vocab)
    ent0 = oracle_bert_tokenize(sentence[pos_min[0] : pos_min[1]], vocab)
    sent1 = oracle_bert_tokenize(sentence[pos_min[1] : pos_max[0]], vocab)
    ent1 = oracle_bert_tokenize(sentence[pos_max[0] : pos_max[1]], vocab)
    sent2 = oracle_bert_tokenize(sentence[pos_max[1] :], vocab)
    if mask_entity:
        ent0 = ["[unused4]"] if not rev else ["[unused5]"]
        ent1 = ["[unused5]"] if not rev else ["[unused4]"]
    else:
        if not rev:
            ent0 = ["[unused0]"] + ent0 + ["[unused1]"]
            ent1 = ["[unused2]"] + ent1 + ["[unused3]"]
        else:
            ent0 = ["[unused2]"] + ent0 + ["[unused3]"]
            ent1 = ["[unused0]"] + ent1 + ["[unused1]"]
    re_tokens = ["[CLS]"] + sent0 + ent0 + sent1 + ent1 + sent2 + ["[SEP]"]
    pos1 = 1 + len(sent0) if not rev else 1 + len(sent0 + ent0 + sent1)
    pos2 = 1 + len(sent0 + ent0 + sent1) if not rev else 1 + len(sent0)
    pos1 = min(max_length - 1, pos1)
    pos2 = min(max_length - 1, pos2)
    ids = [vocab[t] if t in vocab else vocab["[UNK]"] for t in re_tokens]
    avai_len = len(ids)
    while len(ids) < max_length:
        ids.append(0)
    ids = ids[:max_length]
    att = [1 if i < avai_len else 0 for i in range(max_length)]
    return np.array([ids]), np.array([att]), pos1, pos2


def _softmax(v):
    e = np.exp(v - v.max())
    return e / e.sum()


def _ln(x, g, b, eps=1e-12):
    mu = x.mean()
    var = x.var()
    return (x - mu) / np.sqrt(var + eps) * g + b


def oracle_bert_forward(token, att_mask, W):
    """Per-position, per-head loop transformer forward (one row)."""
    ids = token[0]
    mask = att_mask[0]
    L = len(ids)
    H = int(W["hidden"])
    heads = int(W["heads"])
    dh = H // heads
    x = np.stack(
        [
            _ln(
                (
                    W["word_emb"][ids[t]] + W["pos_emb"][t] + W["type_emb"][0]
                ).astype(np.float32),
                W["emb_ln_g"], W["emb_ln_b"],
            )
            for t in range(L)
        ]
    )
    for i in range(int(W["layers"])):
        q = x @ W[f"l{i}_q_w"] + W[f"l{i}_q_b"]
        k = x @ W[f"l{i}_k_w"] + W[f"l{i}_k_b"]
        v = x @ W[f"l{i}_v_w"] + W[f"l{i}_v_b"]
        ctx = np.zeros((L, H), dtype=np.float32)
        for h in range(heads):
            qs = q[:, h * dh : (h + 1) * dh]
            ks = k[:, h * dh : (h + 1) * dh]
            vs = v[:, h * dh : (h + 1) * dh]
            for t in range(L):
                scores = np.array(
                    [
                        float(qs[t] @ ks[s]) / np.sqrt(dh)
                        + (0.0 if mask[s] else -10000.0)
                        for s in range(L)
                    ],
                    dtype=np.float32,
                )
                att = _softmax(scores)
                ctx[t, h * dh : (h + 1) * dh] = att @ vs
        attn_out = ctx @ W[f"l{i}_o_w"] + W[f"l{i}_o_b"]
        x = np.stack(
            [
                _ln((x[t] + attn_out[t]).astype(np.float32),
                    W[f"l{i}_att_ln_g"], W[f"l{i}_att_ln_b"])
                for t in range(L)
            ]
        )
        inter = x @ W[f"l{i}_i_w"] + W[f"l{i}_i_b"]
        c = 0.7978845608028654
        inter = 0.5 * inter * (1.0 + np.tanh(c * (inter + 0.044715 * inter**3)))
        ffn = inter.astype(np.float32) @ W[f"l{i}_f_w"] + W[f"l{i}_f_b"]
        x = np.stack(
            [
                _ln((x[t] + ffn[t]).astype(np.float32),
                    W[f"l{i}_ffn_ln_g"], W[f"l{i}_ffn_ln_b"])
                for t in range(L)
            ]
        )
    pooled = np.tanh(x[0] @ W["pool_w"] + W["pool_b"])
    return x, pooled.astype(np.float32)


def oracle_bert_infer(item, vocab, W, id2rel, max_length, entity=False):
    token, att, pos1, pos2 = oracle_bert_encode(item, vocab, max_length)
    hidden, pooled = oracle_bert_forward(token, att, W)
    if entity:
        rep = np.concatenate([hidden[pos1], hidden[pos2]])
        rep = rep @ W["ent_w"].T + W["ent_b"]
    else:
        rep = pooled
    probs = _softmax((rep @ W["fc_w"].T + W["fc_b"]).astype(np.float32))
    pred = int(np.argmax(probs))
    return id2rel[pred], float(probs[pred])
