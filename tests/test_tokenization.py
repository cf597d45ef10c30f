"""Tokenizer parity vs the loop-style oracle (SURVEY.md §5: T1-T8)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from opennre_spark.functions.tokenization import (
    clean_and_split,
    split_on_punctuation,
    strip_accents,
    tokens_to_ids,
)
from tests.oracle.reference_math import oracle_ids, oracle_tokenize

TRICKY = [
    "",
    "   ",
    "Hello, world!",
    "a\tb\nc\rd",
    "nul\x00char and � replacement",
    "CJK 中文字符 mixed with latin",
    "ab中cd",
    "  leading and trailing  ",
    "control\x07chars\x1bjoin",
    "nbsp space and em space",
    "emoji 🎉 stays",  # So (emoji) is category So, not C* -> kept
    "Åccénted wörds",
    "multi   internal    spaces",
    "tabs\t\t\tand\n\nnewlines",
    "Ada Moreno founded Helix Dynamics back in 1998.",
    "B. Gates co-founded Microsoft; everyone knows.",
    "ends with space ",
    "中",
    "中中中",
    "a​b",  # zero-width space is Cf -> dropped, joins neighbours
]


def test_tokenize_parity_tricky():
    for s in TRICKY:
        assert clean_and_split(s) == oracle_tokenize(s), repr(s)


@given(st.text(max_size=200))
@settings(max_examples=500, deadline=None)
def test_tokenize_parity_random(s):
    assert clean_and_split(s) == oracle_tokenize(s)


@given(
    st.lists(st.sampled_from(["the", "Fast", "KEY", "unknown-word", "a"]), max_size=60),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=100, deadline=None)
def test_ids_parity_and_invariants(tokens, max_len):
    vocab = {"the": 0, "fast": 1, "key": 2, "a": 3}
    pad, unk = 98, 99
    got = tokens_to_ids(tokens, vocab, max_len, pad, unk)
    want = oracle_ids(tokens, vocab, max_len, pad, unk)
    assert got == want
    assert len(got) == max_len


def test_punct_split_and_accents():
    assert split_on_punctuation("co-founded;x") == ["co", "-", "founded", ";", "x"]
    assert split_on_punctuation("...") == [".", ".", "."]
    assert split_on_punctuation("") == []
    assert strip_accents("Åccénted") == "Accented"
