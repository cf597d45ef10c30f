"""Batched relation scoring: the fused tokenize -> encode -> classify
kernel (SURVEY.md §2.10 `tokenize_encode_score`).

Replaces the reference's per-item `SoftmaxNN.infer` (softmax_nn.py:28-39)
and the bag eval's 256-row encoder micro-batching
(bag_attention.py:138-150) with one mapInPandas pass: Arrow delivers
columnar batches, tokenization is per-row string work inside the batch,
all dense math is one numpy GEMM per micro-batch. No per-row Python UDF
anywhere (north rule).

Arrow-boundary hygiene (measured: this is where composed-plan time
went): only the columns downstream actually consumes cross the
Python<->JVM boundary — `text` and span columns are consumed inside the
UDF and never emitted; the per-relation score vector and the (H,)-dim
rep are emitted only on request (bag modes need them, sentence argmax
does not).

Model weights: deterministic (seed-frozen) weight dicts are rebuilt once
per executor process via an lru_cache (cheaper than shipping arrays —
they are a pure function of the seed).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import config

# consumed inside the UDF, never re-emitted (h_begin/t_begin stay: they
# are part of the bag stable-ordering key, and they're cheap ints)
_CONSUMED = ("text", "h_end", "t_end", "h_name", "t_name")


def score_instances(
    instances: DataFrame,
    pcnn: bool = False,
    with_rep: bool = False,
    with_scores: bool = False,
    micro_batch: int = config.EVAL_MICRO_BATCH,
    consumed: tuple = _CONSUMED,
    schema: str = "reduced",
    encoder: str | None = None,
    classifier: str = "softmax",
    ckpt: str | None = None,
) -> DataFrame:
    """Score instance rows; returns the non-consumed input columns plus
    pred_rel_id int, pred_score float [, scores array<float>]
    [, rep array<float>].

    Input needs: text, h_begin, h_end, t_begin, t_end.
    Narrow transformation — runs wherever the instances already live.

    encoder: 'cnn' (default), 'pcnn', 'bert' (CLS pooler,
    bert_encoder.py:7-103) or 'bert_entity' (entity-start gather,
    bert_encoder.py:106-215). The legacy `pcnn` flag maps to 'pcnn'.
    classifier: 'softmax' (SoftmaxNN, softmax_nn.py:53-54) or 'sigmoid'
    (SigmoidNN multi-label scoring, sigmoid_nn.py:39-40).
    ckpt: optional exported .npz state dict (S4 checkpoint source) —
    weights.load_state_dict_npz for CNN/PCNN, bert_kernels.
    load_bert_state_dict_npz for the BERT encoders.
    """
    if encoder is None:
        encoder = "pcnn" if pcnn else "cnn"
    keep = [f for f in instances.schema.fields if f.name not in consumed]
    out_fields = list(keep) + [
        T.StructField("pred_rel_id", T.IntegerType(), False),
        T.StructField("pred_score", T.FloatType(), False),
    ]
    if with_scores:
        out_fields.append(T.StructField("scores", T.ArrayType(T.FloatType()), False))
    if with_rep:
        out_fields.append(T.StructField("rep", T.ArrayType(T.FloatType()), False))
    out_schema = T.StructType(out_fields)
    keep_names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import kernels
        from ..functions.encoding import encode_batch
        from ..functions.weights import default_model

        if encoder in ("bert", "bert_entity"):
            from ..functions import bert_kernels
            from ..functions.bert_encoding import bert_encode_batch

            vocab, weights = bert_kernels.default_bert_model(
                entity=(encoder == "bert_entity"), schema=schema, ckpt=ckpt
            )
            L = config.BERT_MAX_LENGTH
            rep_fn = (
                bert_kernels.bert_entity_rep
                if encoder == "bert_entity"
                else bert_kernels.bert_cls_rep
            )

            def encode_and_score(texts, hb, he, tb, te):
                enc = bert_encode_batch(texts, hb, he, tb, te, vocab, L)
                rep = rep_fn(
                    enc["token"], enc["att_mask"], enc["pos1"], enc["pos2"], weights
                )
                logits = rep @ weights["fc_w"].T + weights["fc_b"]
                if classifier == "sigmoid":
                    return rep, kernels.sigmoid(logits)
                return rep, kernels.softmax(logits, axis=-1)

        else:
            vocab, weights = default_model(
                pcnn=(encoder == "pcnn"), schema=schema, ckpt=ckpt
            )
            pad_id = vocab["[PAD]"]
            unk_id = vocab["[UNK]"]
            L = int(weights["max_length"])

            def encode_and_score(texts, hb, he, tb, te):
                enc = encode_batch(
                    texts, hb, he, tb, te, vocab, L, pad_id, unk_id,
                    with_mask=(encoder == "pcnn"),
                )
                rep, pr = kernels.sentence_scores(
                    enc, weights, pcnn=(encoder == "pcnn")
                )
                if classifier == "sigmoid":
                    logits = kernels.linear(rep, weights["fc_w"], weights["fc_b"])
                    pr = kernels.sigmoid(logits)
                return rep, pr
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            texts = pdf["text"].tolist()
            hb = pdf["h_begin"].to_numpy()
            he = pdf["h_end"].to_numpy()
            tb = pdf["t_begin"].to_numpy()
            te = pdf["t_end"].to_numpy()
            reps = []
            probs = []
            # bounded micro-batches (reference bs=256, bag_attention.py:140)
            for lo in range(0, n, micro_batch):
                hi = min(lo + micro_batch, n)
                rep, pr = encode_and_score(
                    texts[lo:hi], hb[lo:hi], he[lo:hi], tb[lo:hi], te[lo:hi]
                )
                probs.append(pr)
                if with_rep:
                    reps.append(rep)
            pr = np.concatenate(probs, 0) if len(probs) > 1 else probs[0]
            out = pdf[keep_names].copy()
            out["pred_rel_id"] = pr.argmax(axis=1).astype(np.int32)
            out["pred_score"] = pr.max(axis=1).astype(np.float32)
            if with_scores:
                out["scores"] = list(pr)
            if with_rep:
                rep = np.concatenate(reps, 0) if len(reps) > 1 else reps[0]
                out["rep"] = list(rep)
            yield out

    return instances.mapInPandas(run, schema=out_schema)


def encode_instances(
    instances: DataFrame,
    consumed: tuple = _CONSUMED,
    schema: str = "reduced",
) -> DataFrame:
    """Tokenize + vocab-encode instance rows ONCE, for reuse by several
    scoring consumers (reference behavior: one tokenize pass at data
    load feeds every consumer, data_loader.py:183-205).

    Emits the non-consumed input columns plus the minimal encoded state:
      tok_bin binary — the L token ids packed little-endian int32
                       (L*4 bytes; comparable Arrow weight to the raw
                       text it replaces),
      h_start, t_start, n_tok int — token-level entity starts + real
                       length, from which pos1/pos2/mask are pure
                       vectorized functions (positions_from_starts).

    score_encoded(encode_instances(df)) is bit-identical to
    score_instances(df) for the CNN/PCNN path on aligned Arrow batches:
    same per-row tokenize code, same positional reconstruction, same
    kernels (proven by test_encoded_scoring_bitwise_parity; differently
    composed batches move fused-GEMM float32 results ~1e-7, inside the
    1e-6 parity bar). Persist /
    localCheckpoint the result when several queries consume one corpus —
    each consumer then skips the mention scan, the candidate join
    shuffle, and the per-row string work.

    CNN/PCNN only: the word-level tokenizer is the shared front half of
    both; the BERT path has its own encoder (and its encode cost is
    negligible next to the transformer GEMMs, so sharing buys nothing).
    """
    keep = [f for f in instances.schema.fields if f.name not in consumed]
    out_fields = list(keep) + [
        T.StructField("tok_bin", T.BinaryType(), False),
        T.StructField("h_start", T.IntegerType(), False),
        T.StructField("t_start", T.IntegerType(), False),
        T.StructField("n_tok", T.IntegerType(), False),
    ]
    out_schema = T.StructType(out_fields)
    keep_names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.encoding import encode_tokens_batch
        from ..functions.weights import default_model

        vocab, weights = default_model(schema=schema)
        pad_id = vocab["[PAD]"]
        unk_id = vocab["[UNK]"]
        L = int(weights["max_length"])
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            enc = encode_tokens_batch(
                pdf["text"].tolist(),
                pdf["h_begin"].to_numpy(),
                pdf["h_end"].to_numpy(),
                pdf["t_begin"].to_numpy(),
                pdf["t_end"].to_numpy(),
                vocab, L, pad_id, unk_id,
            )
            tok = np.ascontiguousarray(enc["token"].astype("<i4"))
            out = pdf[keep_names].copy()
            out["tok_bin"] = [tok[i].tobytes() for i in range(n)]
            out["h_start"] = enc["p1_start"].astype(np.int32)
            out["t_start"] = enc["p2_start"].astype(np.int32)
            out["n_tok"] = enc["n_real"].astype(np.int32)
            yield out

    return instances.mapInPandas(run, schema=out_schema)


def score_encoded(
    encoded: DataFrame,
    pcnn: bool = False,
    with_rep: bool = False,
    with_scores: bool = False,
    micro_batch: int = config.EVAL_MICRO_BATCH,
    schema: str = "reduced",
    encoder: str | None = None,
    classifier: str = "softmax",
    ckpt: str | None = None,
) -> DataFrame:
    """The GEMM half of score_instances, over encode_instances output.

    Consumes tok_bin/h_start/t_start/n_tok (never re-emitted) and
    returns the remaining columns plus pred_rel_id, pred_score
    [, scores] [, rep] — bit-identical to score_instances on the same
    rows (shared tokenizer, shared positions_from_starts, shared
    kernels; asserted by tests/test_pipeline.py).
    """
    if encoder is None:
        encoder = "pcnn" if pcnn else "cnn"
    if encoder not in ("cnn", "pcnn"):
        raise ValueError(
            f"score_encoded supports cnn/pcnn, got {encoder!r} "
            "(the BERT path encodes inline — see encode_instances docstring)"
        )
    enc_cols = ("tok_bin", "h_start", "t_start", "n_tok")
    keep = [f for f in encoded.schema.fields if f.name not in enc_cols]
    out_fields = list(keep) + [
        T.StructField("pred_rel_id", T.IntegerType(), False),
        T.StructField("pred_score", T.FloatType(), False),
    ]
    if with_scores:
        out_fields.append(T.StructField("scores", T.ArrayType(T.FloatType()), False))
    if with_rep:
        out_fields.append(T.StructField("rep", T.ArrayType(T.FloatType()), False))
    out_schema = T.StructType(out_fields)
    keep_names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import kernels
        from ..functions.encoding import positions_from_starts
        from ..functions.weights import default_model

        vocab, weights = default_model(
            pcnn=(encoder == "pcnn"), schema=schema, ckpt=ckpt
        )
        L = int(weights["max_length"])
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            token = np.frombuffer(
                b"".join(pdf["tok_bin"]), dtype="<i4"
            ).reshape(n, L).astype(np.int64)
            h_start = pdf["h_start"].to_numpy().astype(np.int64)
            t_start = pdf["t_start"].to_numpy().astype(np.int64)
            n_real = pdf["n_tok"].to_numpy().astype(np.int64)
            reps = []
            probs = []
            for lo in range(0, n, micro_batch):
                hi = min(lo + micro_batch, n)
                batch = {
                    "token": token[lo:hi],
                    "n_real": n_real[lo:hi],
                    **positions_from_starts(
                        h_start[lo:hi], t_start[lo:hi], n_real[lo:hi], L,
                        with_mask=(encoder == "pcnn"),
                    ),
                }
                rep, pr = kernels.sentence_scores(
                    batch, weights, pcnn=(encoder == "pcnn")
                )
                if classifier == "sigmoid":
                    logits = kernels.linear(rep, weights["fc_w"], weights["fc_b"])
                    pr = kernels.sigmoid(logits)
                probs.append(pr)
                if with_rep:
                    reps.append(rep)
            pr = np.concatenate(probs, 0) if len(probs) > 1 else probs[0]
            out = pdf[keep_names].copy()
            out["pred_rel_id"] = pr.argmax(axis=1).astype(np.int32)
            out["pred_score"] = pr.max(axis=1).astype(np.float32)
            if with_scores:
                out["scores"] = list(pr)
            if with_rep:
                rep = np.concatenate(reps, 0) if len(reps) > 1 else reps[0]
                out["rep"] = list(rep)
            yield out

    return encoded.mapInPandas(run, schema=out_schema)


def sentence_predictions(scored: DataFrame, id2rel: dict[int, str]) -> DataFrame:
    """Map argmax rel ids to names via a broadcast join with the
    relations dim (SURVEY.md J5) — keeps the mapping in the plan instead
    of a Python UDF.
    """
    spark = scored.sparkSession
    rels = spark.createDataFrame(
        [(i, r) for i, r in sorted(id2rel.items())], "pred_rel_id int, relation string"
    )
    return scored.join(F.broadcast(rels), "pred_rel_id", "left")
