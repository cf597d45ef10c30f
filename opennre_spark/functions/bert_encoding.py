"""BERT instance encoding (SURVEY.md §2.7 T12, T15): entity-marker
insertion + attention mask, per the reference BERTEncoder.tokenize
(/root/reference/opennre/encoder/bert_encoder.py:35-103; the
entity-pooler twin 145-215 builds identical tensors):

  [CLS] sent0 [unused0] ent0 [unused1] sent1 [unused2] ent1 [unused3]
  sent2 [SEP]
  rev (head starts after tail) swaps the marker pairs; mask_entity
  replaces entity pieces with [unused4]/[unused5];
  pos1/pos2 = index of the head/tail start marker, clamped to
  max_length-1 (bert_encoder.py:85-86);
  ids padded with 0 (= [PAD], bert_encoder.py:95); attention mask is 1
  over the unpadded prefix (bert_encoder.py:99-101).
"""

from __future__ import annotations

import numpy as np

from .bert_tokenization import bert_tokenize


def bert_encode_instance(
    text: str,
    h_pos: tuple[int, int],
    t_pos: tuple[int, int],
    vocab: dict[str, int],
    max_length: int,
    mask_entity: bool = False,
):
    h0, h1 = int(h_pos[0]), int(h_pos[1])
    t0, t1 = int(t_pos[0]), int(t_pos[1])
    if h0 > t0:
        (a0, a1), (b0, b1) = (t0, t1), (h0, h1)
        rev = True
    else:
        (a0, a1), (b0, b1) = (h0, h1), (t0, t1)
        rev = False
    sent0 = bert_tokenize(text[:a0], vocab)
    ent0 = bert_tokenize(text[a0:a1], vocab)
    sent1 = bert_tokenize(text[a1:b0], vocab)
    ent1 = bert_tokenize(text[b0:b1], vocab)
    sent2 = bert_tokenize(text[b1:], vocab)

    if mask_entity:
        ent0 = ["[unused4]"] if not rev else ["[unused5]"]
        ent1 = ["[unused5]"] if not rev else ["[unused4]"]
    else:
        ent0 = (
            ["[unused0]"] + ent0 + ["[unused1]"]
            if not rev
            else ["[unused2]"] + ent0 + ["[unused3]"]
        )
        ent1 = (
            ["[unused2]"] + ent1 + ["[unused3]"]
            if not rev
            else ["[unused0]"] + ent1 + ["[unused1]"]
        )
    re_tokens = ["[CLS]"] + sent0 + ent0 + sent1 + ent1 + sent2 + ["[SEP]"]
    pos1 = 1 + len(sent0) if not rev else 1 + len(sent0) + len(ent0) + len(sent1)
    pos2 = 1 + len(sent0) + len(ent0) + len(sent1) if not rev else 1 + len(sent0)
    pos1 = min(max_length - 1, pos1)
    pos2 = min(max_length - 1, pos2)

    unk = vocab["[UNK]"]
    ids = [vocab.get(t, unk) for t in re_tokens]
    avai_len = len(ids)
    if len(ids) < max_length:
        ids = ids + [0] * (max_length - len(ids))  # 0 == [PAD]
    ids = ids[:max_length]
    return ids, min(avai_len, max_length), pos1, pos2


def bert_encode_batch(
    texts, h_starts, h_ends, t_starts, t_ends,
    vocab: dict[str, int],
    max_length: int,
    mask_entity: bool = False,
):
    B = len(texts)
    token = np.empty((B, max_length), dtype=np.int64)
    avail = np.empty(B, dtype=np.int64)
    pos1 = np.empty(B, dtype=np.int64)
    pos2 = np.empty(B, dtype=np.int64)
    for i in range(B):
        ids, n, p1, p2 = bert_encode_instance(
            texts[i], (h_starts[i], h_ends[i]), (t_starts[i], t_ends[i]),
            vocab, max_length, mask_entity,
        )
        token[i] = ids
        avail[i] = n
        pos1[i] = p1
        pos2[i] = p2
    att_mask = (np.arange(max_length)[None, :] < avail[:, None]).astype(np.int64)
    return {"token": token, "att_mask": att_mask, "pos1": pos1, "pos2": pos2}
