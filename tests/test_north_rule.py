"""The north-rule gate, stated as the rule states it: emitted
(subj, pred, obj) triples must match the reference's decisions at
P/R >= 0.95. The 'reference decisions' are the loop-oracle re-run of
the reference math (SURVEY.md §5/§6) over the exact same instances."""

import pytest

from opennre_spark import relations
from opennre_spark.operators.candidates import candidate_pairs
from opennre_spark.operators.mentions import detect_mentions
from opennre_spark.pipeline import extract_triples, na_rel_id
from opennre_spark.sources.transcripts import transcripts_df
from tests.oracle import reference_math as om


@pytest.mark.parametrize("schema", ["reduced", "wiki80", "nyt10"])
def test_triple_pr_vs_reference_decisions(spark, schema):
    transcripts = transcripts_df(spark, 25).cache()
    # reference decisions: oracle-infer every candidate instance,
    # keep non-NA argmax, distinct triples (facts-set semantics)
    mentions = detect_mentions(transcripts, relations.gazetteer())
    instances = candidate_pairs(mentions).collect()
    assert len(instances) > 100

    from opennre_spark.functions.weights import default_model

    vocab, W = default_model(schema=schema)
    rel2id = relations.rel2id_for(schema)
    id2rel = {v: k for k, v in rel2id.items()}
    neg = na_rel_id(rel2id)
    want = set()
    for r in instances:
        item = {
            "text": r.text,
            "h": {"pos": [r.h_begin, r.h_end]},
            "t": {"pos": [r.t_begin, r.t_end]},
        }
        rel, _ = om.oracle_infer(item, vocab, W, id2rel, 40)
        if neg is None or rel2id[rel] != neg:
            want.add((r.h_id, rel, r.t_id))

    got = {
        (r.subj, r.pred, r.obj)
        for r in extract_triples(
            transcripts, mode="sentence", schema=schema
        ).collect()
    }
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    # and in fact exact parity is expected on this corpus
    assert precision == 1.0 and recall == 1.0
    transcripts.unpersist()
