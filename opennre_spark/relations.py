"""Relation schema, entity gazetteer and sentence templates for the
deterministic synthetic transcripts corpus (FIXTURES.md F1-F3).

Schema format follows the reference's NYT-style rel2id contract: 'NA'
must map to id 0 — the reference eval hardcodes positive labels as
range(1, N) (/root/reference/opennre/framework/data_loader.py:295-301)
and detects the negative class by name (data_loader.py:67-74).
"""

from __future__ import annotations

def _load_fixture_json(name: str) -> dict:
    """Load a repo fixture next to the package — works both from a
    filesystem checkout (repo/fixtures/<name>) and from a zipimport
    deployment (spark-submit --py-files dist/opennre_spark.zip, where
    the package root IS the zip and the fixture is archived inside it —
    plain open() cannot reach into a zip)."""
    import json
    import os
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "fixtures", name)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    if os.path.isfile(root) and zipfile.is_zipfile(root):
        with zipfile.ZipFile(root) as z, z.open(f"fixtures/{name}") as f:
            return json.load(f)
    raise FileNotFoundError(path)


# --- relation schema (FIXTURES.md F3: reduced 8-relation NYT-style) ---
def wiki80_rel2id() -> dict[str, int]:
    """The public Wiki80 label schema: 80 Wikidata property names, NO
    negative class (supervised classification; names listed in
    /root/reference/benchmark/rel4wiki80.md:3-83, checked in as
    fixtures/wiki80_rel2id.json)."""
    return _load_fixture_json("wiki80_rel2id.json")


def nyt10_rel2id() -> dict[str, int]:
    """53-relation Freebase-style NYT10 schema (NA=0) — the reference's
    headline distant-supervision benchmark (pretrain.py:126-148 wires the
    nyt10 rel2id; README.md:28-43 publishes only NYT10 numbers). The
    reference does NOT check the json in (download-only,
    benchmark/download_nyt10.sh), so fixtures/nyt10_rel2id.json is
    reconstructed from the published NYT10 (Riedel et al. 2010) relation
    inventory: 52 Freebase predicates + NA at id 0, which is the shape
    every reference eval assumes (positive labels = range(1, N),
    data_loader.py:295-301)."""
    return _load_fixture_json("nyt10_rel2id.json")


def ckpt_rel2id(path: str) -> dict[str, int]:
    """rel2id embedded in an exported S4 checkpoint (`__rel2id__`,
    written by tools/export_ckpt.py and both engine sinks). This is how
    benchmark schemas the reference only ships as runtime downloads
    (e.g. tacred, pretrain.py:164-171 downloads tacred_rel2id.json)
    reach the engine: the exported checkpoint carries its own label
    map, which is authoritative for that model's classifier rows."""
    import json

    import numpy as np

    with np.load(path) as raw:
        if "__rel2id__" not in raw:
            raise ValueError(
                f"checkpoint {path!r} has no embedded __rel2id__ — "
                "re-export it with tools/export_ckpt.py (which records "
                "the benchmark's rel2id.json) or pass a named schema "
                "instead"
            )
        return {
            k: int(v) for k, v in json.loads(str(raw["__rel2id__"])).items()
        }


def nyt10m_shaped_rel2id() -> dict[str, int]:
    """Engine-native MULTI-LABEL schema in the NYT10m shape: 25 labels
    (NA=0 + 24 Freebase predicates drawn from the NYT10 inventory).
    The reference's actual nyt10m_rel2id.json is a runtime download
    (pretrain.py:36-51, benchmark/download_nyt10m.sh) absent from both
    trees, so this fixture reproduces the dataset SHAPE the multilabel
    paths consume — 25 classes, `anno_relation_list` rows
    (data_loader.py:393-397), NA-dropped one-hot training targets —
    with real predicate names; an exported real checkpoint would carry
    its own rel2id via the ckpt: route."""
    return _load_fixture_json("nyt10m_shaped_rel2id.json")


def wiki20m_shaped_rel2id() -> dict[str, int]:
    """Engine-native Wiki20m-shaped multilabel schema: NA=0 + the 80
    Wiki80 property names at 1..80. The wiki20m benchmark is wiki80's
    label set plus a negative class, with `anno_relation_list` rows in
    its manually-annotated test set; its rel2id.json is a reference
    runtime download (pretrain.py:53-65,
    benchmark/download_wiki20m.sh), so the SHAPE derives from the
    checked-in wiki80 fixture rather than a second file — an exported
    real checkpoint's embedded rel2id (ckpt: route) stays
    authoritative for real weights."""
    out = {"NA": 0}
    for name, i in sorted(wiki80_rel2id().items(), key=lambda kv: kv[1]):
        out[name] = i + 1
    return out


def rel2id_for(schema: str) -> dict[str, int]:
    """Named schema -> rel2id map (S2 scan; one place so pipeline,
    weights and queries can never disagree on a schema's labels).
    The 'ckpt:<path>' form resolves to the rel2id embedded in that
    exported checkpoint (ckpt_rel2id) — the route for benchmark
    schemas that exist only as reference runtime downloads."""
    if schema == "reduced":
        return REL2ID
    if schema == "wiki80":
        return wiki80_rel2id()
    if schema == "nyt10":
        return nyt10_rel2id()
    if schema == "nyt10m_shaped":
        return nyt10m_shaped_rel2id()
    if schema == "wiki20m_shaped":
        return wiki20m_shaped_rel2id()
    if schema.startswith("ckpt:"):
        return ckpt_rel2id(schema[len("ckpt:"):])
    raise ValueError(f"unknown relation schema {schema!r}")


# NYT10-style predicate names for the synthetic templates below: in
# 'nyt10' schema mode the gold label of each positive template maps onto
# the closest Freebase predicate, so synthetic corpora can exercise the
# 53-relation schema end-to-end with non-NA facts.
TEMPLATE_REL_TO_NYT10: dict[str, str] = {
    "founder_of": "/business/company/founders",
    "ceo_of": "/business/person/company",
    "headquartered_in": "/location/location/contains",
    "born_in": "/people/person/place_of_birth",
    "capital_of": "/location/country/capital",
    "employee_of": "/people/person/profession",
    "spouse_of": "/people/family/members",
}

REL2ID: dict[str, int] = {
    "NA": 0,
    "founder_of": 1,
    "ceo_of": 2,
    "headquartered_in": 3,
    "born_in": 4,
    "capital_of": 5,
    "employee_of": 6,
    "spouse_of": 7,
}
ID2REL: dict[int, str] = {v: k for k, v in REL2ID.items()}

# --- gazetteer (FIXTURES.md F2) -------------------------------------
# (entity_id, surface_name, canonical_id). Near-duplicate surface forms
# share a canonical id to exercise MinHash-LSH linking + connected
# components downstream.
_PEOPLE = [
    "Ada Moreno", "Bruno Falk", "Carla Jensen", "Derek Osei", "Elif Aydin",
    "Farid Khan", "Greta Lindqvist", "Hiro Tanaka", "Ines Duarte", "Jonas Weber",
    "Keiko Mori", "Luca Bianchi", "Mara Sorescu", "Nadia Belmont", "Owen Pratt",
]
_ORGS = [
    "Helix Dynamics", "Quanta Forge", "Bluepine Labs", "Vextra Systems",
    "Marlowe Group", "Northgate Works", "Citrine Analytics", "Pallas Robotics",
    "Riverbend Media", "Solvex Energy",
]
_PLACES = [
    "Arvalon", "Brimhaven", "Calder Bay", "Dunmore", "Eastvale",
    "Fenwick", "Graystone", "Holloway", "Ironport", "Jarrow",
]


def gazetteer() -> list[tuple[str, str, str]]:
    rows: list[tuple[str, str, str]] = []
    for i, name in enumerate(_PEOPLE):
        canon = f"P{i:03d}"
        rows.append((f"P{i:03d}a", name, canon))
        # surface variants sharing the canonical id (linking fixtures)
        first, last = name.split(" ", 1)
        rows.append((f"P{i:03d}b", f"{first[0]}. {last}", canon))
        if i % 3 == 0:
            rows.append((f"P{i:03d}c", name.lower(), canon))
    for i, name in enumerate(_ORGS):
        canon = f"O{i:03d}"
        rows.append((f"O{i:03d}a", name, canon))
        if i % 2 == 0:
            rows.append((f"O{i:03d}b", name.upper(), canon))
    for i, name in enumerate(_PLACES):
        rows.append((f"L{i:03d}a", name, f"L{i:03d}"))
    return rows


# --- templates (FIXTURES.md F1) -------------------------------------
# Positive templates: {h}/{t} slots; relation is the gold label for the
# directed (h, t) pair. kinds constrain which gazetteer pools h/t draw
# from: P=person, O=org, L=place.
POSITIVE_TEMPLATES: list[tuple[str, str, str, str]] = [
    ("founder_of", "P", "O", "{h} founded {t} back in 1998."),
    ("founder_of", "P", "O", "As everyone knows, {h} started {t} from a garage."),
    ("ceo_of", "P", "O", "{h} is the chief executive of {t} these days."),
    ("ceo_of", "P", "O", "The board confirmed {h} as CEO of {t}."),
    ("headquartered_in", "O", "L", "{h} is headquartered in {t}."),
    ("headquartered_in", "O", "L", "The main office of {h} sits in {t}."),
    ("born_in", "P", "L", "{h} was born in {t} in the seventies."),
    ("capital_of", "L", "L", "{h} is the capital of the {t} region."),
    ("employee_of", "P", "O", "{h} works at {t} on the data team."),
    ("spouse_of", "P", "P", "{h} married {t} last spring."),
]
# Negative templates: two entities, no relation expressed -> gold NA.
NEGATIVE_TEMPLATES: list[tuple[str, str, str]] = [
    ("P", "O", "{h} has never even visited the {t} booth."),
    ("P", "P", "{h} and {t} appeared on the same panel."),
    ("O", "L", "{h} shipped a demo while {t} hosted the expo."),
]
# Filler turns: zero or one mention, no pair (candidate-negative rows).
FILLER_TEMPLATES: list[str] = [
    "Let me check the docs for that.",
    "The deploy finished without errors.",
    "{h} was mentioned in the changelog.",
    "Could you rerun the pipeline with more memory?",
    "{h} gave a keynote nobody recorded.",
]


def vocabulary_words() -> list[str]:
    """Every word that can appear in a synthetic transcript (template
    words + gazetteer tokens) plus a few decoys that stay out-of-vocab
    when lowercased differently. Order is deterministic.
    """
    words: list[str] = []
    seen = set()

    def add(text: str):
        from .functions.tokenization import clean_and_split

        for tok in clean_and_split(text):
            lw = tok.lower()
            if lw not in seen:
                seen.add(lw)
                words.append(lw)

    for _, _, _, tpl in POSITIVE_TEMPLATES:
        add(tpl.replace("{h}", " ").replace("{t}", " "))
    for _, _, tpl in NEGATIVE_TEMPLATES:
        add(tpl.replace("{h}", " ").replace("{t}", " "))
    for tpl in FILLER_TEMPLATES:
        add(tpl.replace("{h}", " "))
    for _, name, _ in gazetteer():
        add(name)
    return words
