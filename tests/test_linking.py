"""Entity linking: MinHash-LSH blocking + connected components (J4).

Gold clustering comes from the gazetteer's canonical_id (FIXTURES.md
F2: surface variants like 'Ada Moreno' / 'A. Moreno' / 'ada moreno'
share a canonical id).
"""

import pytest

from opennre_spark import relations
from opennre_spark.operators.linking import (
    candidate_edges,
    connected_components,
    link_entities,
)


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (30, 31), (31, 32), (32, 30)],
        "src long, dst long",
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[30] == comp[31] == comp[32] == 30


def test_connected_components_long_chain(spark):
    """A path graph exercises multiple large/small-star rounds."""
    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_candidate_edges_find_variants(spark):
    names = spark.createDataFrame(
        [(n,) for _, n, _ in relations.gazetteer()], "name string"
    )
    edges = candidate_edges(names)
    got = {(r.name_a, r.name_b) for r in edges.collect()}
    # abbreviated person variants must be blocked + verified
    assert ("A. Moreno", "Ada Moreno") in got or ("Ada Moreno", "A. Moreno") in got


def test_link_entities_matches_gold_clusters(spark):
    gaz = relations.gazetteer()
    mentions = spark.createDataFrame([(n,) for _, n, _ in gaz], "name string")
    mapping = {r.name: r.canonical_name for r in link_entities(mentions).collect()}
    # group gold by canonical id
    gold: dict[str, set] = {}
    for _, name, canon in gaz:
        gold.setdefault(canon, set()).add(name)
    merged_wrong = []
    split_wrong = []
    for canon, names in gold.items():
        mapped = {mapping[n] for n in names}
        if len(mapped) != 1:
            split_wrong.append((canon, names, mapped))
    # no two distinct gold clusters may share a canonical name
    seen: dict[str, str] = {}
    for canon, names in gold.items():
        rep = mapping[next(iter(names))]
        if rep in seen and seen[rep] != canon:
            merged_wrong.append((rep, seen[rep], canon))
        seen[rep] = canon
    assert not split_wrong, f"split clusters: {split_wrong[:3]}"
    assert not merged_wrong, f"merged clusters: {merged_wrong[:3]}"
