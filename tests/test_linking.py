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


def _uf_oracle(edges):
    """Union-find reference: node -> min member id of its component,
    over nodes incident to at least one non-self-loop edge (the
    operator's contract: pure self-loop nodes don't appear)."""
    nodes = {u for u, v in edges if u != v} | {v for u, v in edges if u != v}
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u == v:
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        [],                                    # empty graph
        [(5, 5)],                              # pure self-loop
        [(0, i) for i in range(1, 12)],        # star
        [(i, i + 1) for i in range(12)],       # chain
        # two cliques bridged by nothing + a reversed-order chain
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
        + [(9, 8), (8, 7), (7, 9)],
    ],
)
def test_connected_components_structured_vs_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _uf_oracle(edges)


def test_connected_components_property_vs_union_find(spark):
    """CC underpins three oracle-checked operators (linking, minhash
    clusters, embedding clusters); property-check the large-star/
    small-star implementation against union-find on seeded random
    graphs — mixes of stars, chains, cliques, duplicate and reversed
    edges, self-loops (VERDICT r2 item 7)."""
    import random

    for seed in range(6):
        rng = random.Random(1000 + seed)
        n = rng.randrange(2, 30)
        m = rng.randrange(0, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # sprinkle structure: a clique and a chain over random nodes
        clique = rng.sample(range(n), min(4, n))
        edges += [(a, b) for ai, a in enumerate(clique) for b in clique[ai + 1:]]
        chain = rng.sample(range(n), min(5, n))
        edges += list(zip(chain, chain[1:]))
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == _uf_oracle(edges), f"seed {seed}: CC != union-find"


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


def test_canonical_triples_merges_variants(spark):
    """Full composition: triples on variant entity ids collapse onto the
    discovered canonical surface form."""
    from opennre_spark.pipeline import canonical_triples

    triples = spark.createDataFrame(
        [
            ("P000a", "founder_of", "O000a", 0.9, 2),  # Ada Moreno / Helix Dynamics
            ("P000b", "founder_of", "O000b", 0.8, 1),  # A. Moreno / HELIX DYNAMICS
            ("P001a", "spouse_of", "P002a", 0.7, 1),   # distinct pair stays
        ],
        "subj string, pred string, obj string, score double, n_support long",
    )
    got = {
        (r.subj, r.pred, r.obj): (round(r.score, 6), r.n_support)
        for r in canonical_triples(triples).collect()
    }
    # the two variant triples merged into one canonical fact
    assert len(got) == 2
    merged = [(k, v) for k, v in got.items() if k[1] == "founder_of"]
    assert len(merged) == 1
    (subj, _, obj), (score, support) = merged[0]
    assert subj == "A. Moreno"  # lexicographically smallest cluster member
    assert obj in ("HELIX DYNAMICS", "Helix Dynamics")
    assert score == 0.9 and support == 3
