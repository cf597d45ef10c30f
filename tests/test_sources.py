"""Instance-file source (S1/P2): safe JSON-lines parsing of the
reference's instance format, incl. blank lines, reversed spans, and the
pre-tokenized 'token' variant (FIXTURES.md F4)."""

import json

import pytest

from opennre_spark.operators.scoring import score_instances
from opennre_spark.sources.instances import read_instances


@pytest.fixture()
def instance_file(tmp_path):
    rows = [
        {
            "text": "Ada Moreno founded Helix Dynamics back in 1998.",
            "h": {"id": "P000a", "name": "Ada Moreno", "pos": [0, 10]},
            "t": {"id": "O000a", "name": "Helix Dynamics", "pos": [19, 33]},
            "relation": "founder_of",
        },
        {
            "text": "Helix Dynamics was founded by Ada Moreno.",
            "h": {"id": "P000a", "name": "Ada Moreno", "pos": [30, 40]},
            "t": {"id": "O000a", "name": "Helix Dynamics", "pos": [0, 14]},
            "relation": "founder_of",
        },
        {
            "token": ["Bruno", "Falk", "works", "at", "Quanta", "Forge"],
            "h": {"id": "P001a", "name": "Bruno Falk", "pos": [0, 2]},
            "t": {"id": "O001a", "name": "Quanta Forge", "pos": [4, 6]},
            "relation": "employee_of",
        },
    ]
    p = tmp_path / "instances.txt"
    with open(p, "w") as f:
        f.write("\n")  # leading blank line (P2)
        for r in rows:
            f.write(json.dumps(r) + "\n\n")  # interleaved blanks
    return str(p)


def test_read_instances(spark, instance_file):
    df = read_instances(spark, instance_file)
    rows = {r.h_id: r for r in df.collect()}
    assert len(rows) == 3 or len(df.collect()) == 3
    a = [r for r in df.collect() if r.relation == "founder_of"][0]
    assert a.text[a.h_begin : a.h_end] == "Ada Moreno"
    tok = [r for r in df.collect() if r.relation == "employee_of"][0]
    assert tok.text == "Bruno Falk works at Quanta Forge"
    assert tok.text[tok.h_begin : tok.h_end] == "Bruno Falk"
    assert tok.text[tok.t_begin : tok.t_end] == "Quanta Forge"


def test_instances_scoreable(spark, instance_file):
    df = read_instances(spark, instance_file)
    scored = score_instances(df).collect()
    assert len(scored) == 3
    assert all(0.0 < r.pred_score <= 1.0 for r in scored)
