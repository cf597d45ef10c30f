"""Dump .explain('formatted') for every query the r7 optimization round
touched, into plans/r07/<query>_<suffix>.txt.

Usage: python tools/dump_plans_r07.py <tree_path> <suffix> <out_dir>
  tree_path: repo root whose opennre_spark to import (round-6 worktree
             for the _before files, the live repo for _after)
  suffix:    "before" | "after"
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def cap(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    tree, suffix, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, tree)
    os.makedirs(out_dir, exist_ok=True)

    from opennre_spark.pipeline import encode_candidates, extract_triples
    from opennre_spark.plans import queries as plans
    from opennre_spark.session import get_spark
    from opennre_spark.sources.transcripts import transcripts_df

    spark = get_spark("plans_r07", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.queries()
    sf_dir = "/root/testdata/sf0.1"

    t = transcripts_df(spark, 40)
    bt = transcripts_df(spark, 16)
    enc = encode_candidates(t)

    out = {
        "kg_sentence": extract_triples(t, mode="sentence"),
        "kg_encode": enc,
        "kg_sentence_enc": extract_triples(t, mode="sentence", encoded=enc),
        "kg_bag_one": extract_triples(t, mode="one", threshold=0.15, encoded=enc),
        "kg_bag_att": extract_triples(t, mode="att", threshold=0.15, encoded=enc),
        "kg_bert": extract_triples(bt, mode="sentence", encoder="bert"),
        "j3_window_self_join": qs["j3_window_self_join"](spark, sf_dir),
        "media_feature_extract": qs["media_feature_extract"](spark, sf_dir),
        "ann_ivf_topk": qs["ann_ivf_topk"](spark, sf_dir),
        # batch 2: dedup / text / ANN operators (plan construction for
        # some of these executes their eager localCheckpoints — fine,
        # the dump runs offline)
        "dedup_minhash_pairs": qs["dedup_minhash_pairs"](spark, sf_dir),
        "dedup_ngram_jaccard": qs["dedup_ngram_jaccard"](spark, sf_dir),
        "dedup_simhash_pairs": qs["dedup_simhash_pairs"](spark, sf_dir),
        "text_winnow_fingerprints": qs["text_winnow_fingerprints"](spark, sf_dir),
        "text_document_stats": qs["text_document_stats"](spark, sf_dir),
        "ann_lsh_self_join": qs["ann_lsh_self_join"](spark, sf_dir),
        "ann_cosine_pairs": qs["ann_cosine_pairs"](spark, sf_dir),
    }
    for name, df in out.items():
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(cap(df))
        print("wrote", path)


if __name__ == "__main__":
    main()
