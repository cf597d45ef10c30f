"""Bag-level aggregation over entity pairs (SURVEY.md §2.4 A1-A6).

A bag = all scored instances sharing (h_id, t_id) — eval-mode
`entpair_as_bag=True` keying (data_loader.py:160-168; bag_re.py:47,57).
Spark's shuffle replaces the reference's scope/collate bookkeeping
(data_loader.py:207-222): groupBy(h_id, t_id) + applyInPandas.

Stable member ordering (A1): rows are sorted by (conv_id, turn_idx,
pair_turn_idx, h_begin, t_begin) inside each group before the numpy
math. `att` is order-sensitive in its float32 sum reductions, so this
ordering is part of the determinism contract (SURVEY.md §7 hard parts).

Deterministic size cap (A2): the reference uses random.sample
(data_loader.py:183-190, nondeterministic); we take the first `bag_cap`
members of the stable order — documented delta, used as a skew guard for
hot entity pairs (north rule).

`one` additionally ships as a pure-DataFrame aggregation
(`bag_one_native`): per-relation max is associative, so Catalyst plans a
partial (map-side) aggregate before the shuffle — preferred at scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import kernels


def resize_bag(pdf: pd.DataFrame, bag_size: int, h_id: str, t_id: str,
               seed: int = 42) -> pd.DataFrame:
    """A2 fixed-size bag resize, deterministic-seeded variant of
    data_loader.py:185-190: oversized bags are sampled WITHOUT
    replacement down to bag_size; undersized bags keep every member and
    pad by sampling WITH replacement. The reference uses process-global
    random.sample/np.random.choice (nondeterministic); here the RNG is
    seeded per bag key so any executor produces the same resize.
    Selection order: kept members stay in the stable sort order
    (the reference's random permutation order is part of its
    nondeterminism, excluded from the parity surface per SURVEY.md §7);
    pad copies append at the end exactly like the reference's
    `bag + list(np.random.choice(...))`."""
    return pdf.iloc[resize_indices(len(pdf), bag_size, h_id, t_id, seed)]


def resize_indices(n: int, bag_size: int, h_id: str, t_id: str,
                   seed: int = 42) -> np.ndarray:
    """The index-selection half of resize_bag, shared by the pandas and
    Arrow-native bag kernels (identical RNG -> identical rows)."""
    seed64 = int.from_bytes(
        hashlib.md5(f"{seed}|{h_id}|{t_id}".encode()).digest()[:8], "little"
    )
    rng = np.random.default_rng(seed64)
    if n >= bag_size:
        return np.sort(rng.choice(n, size=bag_size, replace=False))
    return np.concatenate(
        [np.arange(n), rng.choice(n, size=bag_size - n, replace=True)]
    )

BAG_SCHEMA = T.StructType([
    T.StructField("h_id", T.StringType(), False),
    T.StructField("t_id", T.StringType(), False),
    T.StructField("n_sentences", T.IntegerType(), False),
    T.StructField("scores", T.ArrayType(T.FloatType()), False),
])

_SORT_COLS = ["conv_id", "turn_idx", "pair_turn_idx", "h_begin", "t_begin"]


def bag_scores(
    scored: DataFrame,
    method: str = "att",
    pcnn: bool = False,
    bag_cap: int = 0,
    bag_size: int = 0,
    bag_seed: int = 42,
    encoder: str | None = None,
    schema: str = "reduced",
    ckpt: str | None = None,
) -> DataFrame:
    """Per-bag per-relation score vector via applyInPandas.

    method: 'att' (bag_attention.py:136-164), 'avg'
    (bag_average.py:117-131), or 'one' (bag_one.py:140-148).
    'att'/'avg' need the `rep` column (score_instances(with_rep=True));
    'one' needs only `scores`.

    bag_size > 0 enables the reference's fixed-size resize path
    (data_loader.py:185-190): sample-down without replacement /
    pad-up with replacement, seeded per bag key (see resize_bag).
    It supersedes bag_cap (the cap is the bag_size=0 skew guard).
    """
    if method not in ("att", "avg", "one"):
        raise ValueError(f"unknown bag method {method!r}")
    if encoder is None:
        encoder = "pcnn" if pcnn else "cnn"
    needs_rep = method in ("att", "avg")
    value_col = "rep" if needs_rep else "scores"
    cols = ["h_id", "t_id", value_col] + [
        c for c in _SORT_COLS if c in scored.columns
    ]
    sort_cols = [c for c in _SORT_COLS if c in scored.columns]
    slim = scored.select(*cols)

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        if sort_cols:
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
        if bag_size > 0:
            pdf = resize_bag(
                pdf, bag_size, pdf["h_id"].iloc[0], pdf["t_id"].iloc[0], bag_seed
            )
        elif bag_cap > 0 and len(pdf) > bag_cap:
            pdf = pdf.iloc[:bag_cap]
        mat = np.asarray(pdf[value_col].tolist(), dtype=np.float32)
        if method == "one":
            out = kernels.bag_one_eval(mat)
        else:
            if encoder in ("bert", "bert_entity"):
                from ..functions.bert_kernels import default_bert_model

                _, weights = default_bert_model(
                    entity=(encoder == "bert_entity"), schema=schema, ckpt=ckpt
                )
                # attention diag: ones (bag_attention.py:29), sized to rep
                import numpy as _np

                if "att_diag" not in weights:
                    weights = dict(weights)
                    weights["att_diag"] = _np.ones(
                        weights["fc_w"].shape[1], _np.float32
                    )
            else:
                from ..functions.weights import default_model

                _, weights = default_model(
                    pcnn=(encoder == "pcnn"), schema=schema, ckpt=ckpt
                )
            if method == "att":
                out = kernels.bag_attention_eval(mat, weights)
            else:
                out = kernels.bag_average_eval(mat, weights)
        return pd.DataFrame(
            {
                "h_id": [pdf["h_id"].iloc[0]],
                "t_id": [pdf["t_id"].iloc[0]],
                "n_sentences": [len(pdf)],
                "scores": [out.astype(np.float32)],
            }
        )

    return slim.groupBy("h_id", "t_id").applyInPandas(agg, schema=BAG_SCHEMA)


def bag_scores_batched(
    scored: DataFrame,
    method: str = "att",
    bag_cap: int = 0,
    bag_size: int = 0,
    bag_seed: int = 42,
    encoder: str = "cnn",
    schema: str = "reduced",
    ckpt: str | None = None,
) -> DataFrame:
    """bag_scores with JVM-side bag assembly: groupBy + collect_list
    builds each bag's member list in the aggregation (associative —
    map-side partial collection), then ONE mapInPandas pass runs the
    bag kernel over hundreds of bags per Arrow batch.

    applyInPandas invokes Python once per GROUP; at sf0.1 that is ~15k
    pandas-function calls whose fixed overhead rivals the attention math
    itself. Here the per-bag Python cost is one loop iteration. Members
    are sorted inside the kernel by the same stable key (collect_list
    order is nondeterministic), so outputs are IDENTICAL to bag_scores
    (same sorted float32 matrix -> same kernel ops, bitwise).

    Memory note (bag_cap > 0): the deterministic cap is enforced BEFORE
    the collect_list — a row_number window over the stable member order,
    filtered <= cap — so the aggregation buffer holds at most bag_cap
    members even for a pathological hot entity pair (millions of
    co-mentions would otherwise materialize in ONE buffer before the
    in-kernel cap could act). WindowExec sorts with a spill-safe external
    sorter, and its (h_id, t_id) hash partitioning is reused by the
    groupBy — no extra exchange. The bag_size resize path keeps whole-bag
    assembly: pad-with-replacement genuinely needs every member.
    """
    if method not in ("att", "avg", "one"):
        raise ValueError(f"unknown bag method {method!r}")
    needs_rep = method in ("att", "avg")
    value_col = "rep" if needs_rep else "scores"
    sort_cols = [c for c in _SORT_COLS if c in scored.columns]
    if bag_cap > 0 and bag_size == 0 and sort_cols:
        from pyspark.sql import Window

        w = Window.partitionBy("h_id", "t_id").orderBy(
            *[F.col(c) for c in sort_cols]
        )
        scored = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= F.lit(bag_cap))
            .drop("__rn")
        )
    member = F.struct(*sort_cols, F.col(value_col).alias("__v"))
    grouped = scored.groupBy("h_id", "t_id").agg(
        F.collect_list(member).alias("__members")
    )

    def run(batches):
        if method != "one":
            if encoder in ("bert", "bert_entity"):
                from ..functions.bert_kernels import default_bert_model

                _, weights = default_bert_model(
                    entity=(encoder == "bert_entity"), schema=schema, ckpt=ckpt
                )
                if "att_diag" not in weights:
                    weights = dict(weights)
                    weights["att_diag"] = np.ones(
                        weights["fc_w"].shape[1], np.float32
                    )
            else:
                from ..functions.weights import default_model

                _, weights = default_model(
                    pcnn=(encoder == "pcnn"), schema=schema, ckpt=ckpt
                )
        import pyarrow as pa

        from .scoring import _list_f32

        for rb in batches:
            n_bags = rb.num_rows
            if not n_bags:
                continue
            # Arrow-native decode (r6): the pandas conversion built a
            # python dict PER MEMBER (list<struct> -> list-of-dicts) and
            # a numpy object per __v row; here the list offsets index
            # straight into the struct children as flat numpy arrays,
            # and per-bag ordering is an np.lexsort over the stable-key
            # child slices — the sorted member order (unique key) and
            # the resulting float32 matrices are identical to the
            # pandas path, so kernel outputs are bitwise unchanged.
            mem = rb.column("__members")
            offs = np.asarray(mem.offsets)
            members = mem.values  # StructArray over all bags' members
            keys = {
                c: np.asarray(members.field(c)) for c in sort_cols
            }
            vv = members.field("__v")
            vv_offs = np.asarray(vv.offsets)
            d_sizes = np.diff(vv_offs)
            d = int(d_sizes[0]) if len(d_sizes) else 0
            if len(d_sizes) and not np.all(d_sizes == d):
                raise ValueError("ragged member vectors in bag assembly")
            flat = np.asarray(vv.values, dtype=np.float32)
            span = np.arange(d, dtype=np.int64)
            h_ids = rb.column("h_id").to_pylist()
            t_ids = rb.column("t_id").to_pylist()
            out_n = np.empty(n_bags, dtype=np.int32)
            out_rows = []
            for i in range(n_bags):
                lo, hi = int(offs[i]), int(offs[i + 1])
                order = np.lexsort(
                    tuple(keys[c][lo:hi] for c in reversed(sort_cols))
                )
                idx = lo + order
                if bag_size > 0:
                    idx = idx[
                        resize_indices(
                            len(idx), bag_size, h_ids[i], t_ids[i], bag_seed
                        )
                    ]
                elif bag_cap > 0 and len(idx) > bag_cap:
                    idx = idx[:bag_cap]
                # exact gather: member j's vector lives at
                # flat[vv_offs[j] : vv_offs[j]+d] (offsets are global
                # into the full inner child — verified Arrow semantics)
                mat = flat[vv_offs[idx][:, None] + span[None, :]]
                if method == "one":
                    out = kernels.bag_one_eval(mat)
                elif method == "att":
                    out = kernels.bag_attention_eval(mat, weights)
                else:
                    out = kernels.bag_average_eval(mat, weights)
                out_n[i] = len(idx)
                out_rows.append(out.astype(np.float32))
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("h_id"),
                    rb.column("t_id"),
                    pa.array(out_n, type=pa.int32()),
                    _list_f32(np.stack(out_rows)),
                ],
                names=["h_id", "t_id", "n_sentences", "scores"],
            )

    return grouped.mapInArrow(run, schema=BAG_SCHEMA)


def bag_one_native(scored: DataFrame) -> DataFrame:
    """`one` aggregator as native Spark (A6): posexplode the per-sentence
    softmax scores and take per-relation max. Fully associative ->
    map-side partial aggregation, no Python in the agg path.
    Returns (h_id, t_id, rel_id, score).
    """
    per_rel = scored.select(
        "h_id", "t_id", F.posexplode("scores").alias("rel_id", "score")
    )
    return per_rel.groupBy("h_id", "t_id", "rel_id").agg(
        F.max("score").alias("score")
    )


def bag_average_native(
    scored: DataFrame,
    schema: str = "reduced",
    encoder: str = "cnn",
    ckpt: str | None = None,
) -> DataFrame:
    """`avg` aggregator with a NATIVE two-phase mean (A5): per-dimension
    `avg(rep[i])` aggregates decompose into map-side partials exactly
    like `one`'s max — no Python function runs per group, no rep vector
    rides the shuffle unaggregated. The tiny fc+softmax epilogue is one
    Arrow pass over (n_bags, H) rows.

    Numeric delta vs bag_average_eval (documented): Spark's avg
    accumulates in double and rounds to float32 once, where the
    reference means in float32 (bag_average.py:124) — agreement is
    ~1e-7, inside the golden tolerance. Bag size caps/resizes are NOT
    applied here (this is the bag_size=0 all-sentences eval path).
    Returns (h_id, t_id, n_sentences, scores).
    """
    import numpy as _np

    # rep dimension from the weight config — probing the data
    # (`scored.select("rep").first()`) would execute one partition of the
    # expensive upstream scoring lineage just to measure H, and crash on
    # an empty input (ADVICE r2)
    if encoder in ("bert", "bert_entity"):
        from ..functions.bert_kernels import default_bert_model

        _, _w = default_bert_model(
            entity=(encoder == "bert_entity"), schema=schema, ckpt=ckpt
        )
    else:
        from ..functions.weights import default_model

        _, _w = default_model(pcnn=(encoder == "pcnn"), schema=schema, ckpt=ckpt)
    n_dim = int(_w["fc_w"].shape[1])
    means = scored.groupBy("h_id", "t_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_sentences"),
        F.array(
            *[F.avg(F.col("rep")[i]).cast("float") for i in range(n_dim)]
        ).alias("bag_rep"),
    )

    def classify(batches):
        import pyarrow as pa

        from ..functions import kernels
        from .scoring import _list_f32

        if encoder in ("bert", "bert_entity"):
            from ..functions.bert_kernels import default_bert_model

            _, weights = default_bert_model(
                entity=(encoder == "bert_entity"), schema=schema, ckpt=ckpt
            )
        else:
            from ..functions.weights import default_model

            _, weights = default_model(
                pcnn=(encoder == "pcnn"), schema=schema, ckpt=ckpt
            )
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            br = rb.column("bag_rep")
            offs = _np.asarray(br.offsets)
            if _np.all(_np.diff(offs) == n_dim):
                # contiguous uniform lists: one reshape off the child
                # buffer (offsets are global into the child, so slice
                # from offs[0], not 0)
                rep = _np.asarray(br.values, dtype=_np.float32)[
                    offs[0] : offs[0] + n * n_dim
                ].reshape(n, n_dim)
            else:
                rep = _np.asarray(br.to_pylist(), dtype=_np.float32)
            logits = kernels.linear(rep, weights["fc_w"], weights["fc_b"])
            probs = kernels.softmax(logits, axis=-1).astype(_np.float32)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("h_id"),
                    rb.column("t_id"),
                    rb.column("n_sentences"),
                    _list_f32(probs),
                ],
                names=["h_id", "t_id", "n_sentences", "scores"],
            )

    return means.mapInArrow(classify, schema=BAG_SCHEMA)


def explode_bag_scores(bags: DataFrame, id2rel: dict[int, str]) -> DataFrame:
    """Bag score vectors -> (h_id, t_id, relation, score) rows for every
    non-NA relation — the reference's prediction-record emission
    (bag_re.py:172-179) incl. the NA filter (P3).
    """
    spark = bags.sparkSession
    rels = spark.createDataFrame(
        [(i, r) for i, r in sorted(id2rel.items())], "rel_id int, relation string"
    )
    per_rel = bags.select(
        "h_id", "t_id", "n_sentences",
        F.posexplode("scores").alias("rel_id", "score"),
    )
    return (
        per_rel.join(F.broadcast(rels), "rel_id")
        .filter(F.col("relation") != "NA")
        .select("h_id", "t_id", "relation", "score", "n_sentences")
    )


def bag_one_salted(scored: DataFrame, n_salts: int = 8) -> DataFrame:
    """`one` with explicit hot-key salting (SURVEY.md §4 custom work #2):
    phase 1 aggregates per (h_id, t_id, salt) where salt spreads a hot
    entity pair over n_salts reducers, phase 2 merges the partials —
    legal because per-relation max is associative/commutative
    (bag_one.py:146 `instance_logit.max(dim=0)`).

    With Spark's own map-side partial aggregation this is usually
    redundant for `one`; it exists as the explicit two-phase pattern for
    aggregations whose partials AREN'T auto-derived (and as the
    documented skew strategy the north rule asks for). `att` cannot be
    salted this way (softmax over the full bag does not decompose) —
    its skew guard is the deterministic bag cap.
    """
    per_rel = scored.select(
        "h_id", "t_id",
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_salts)).alias("salt"),
        F.posexplode("scores").alias("rel_id", "score"),
    )
    partial = per_rel.groupBy("h_id", "t_id", "salt", "rel_id").agg(
        F.max("score").alias("score")
    )
    return partial.groupBy("h_id", "t_id", "rel_id").agg(
        F.max("score").alias("score")
    )
