"""BERT-path tokenization (SURVEY.md §2.7 T9-T12), re-implemented from
the reference algorithms:

  - BasicTokenizer: clean -> CJK pad -> whitespace split -> per-token
    (lowercase + strip accents unless in never_split) -> punctuation
    split                        (tokenization/basic_tokenizer.py:42-64)
  - WordpieceTokenizer: greedy longest-match-first '##' subword split,
    UNK for >200-char or unmatchable words
                                 (tokenization/word_piece_tokenizer.py:40-96)
  - BertTokenizer: basic -> join -> wordpiece
                                 (tokenization/bert_tokenizer.py:48-54)

The deterministic wordpiece vocabulary guarantees full coverage (every
single character of the corpus alphabet is present both bare and
'##'-prefixed), so UNK appears only via the length guard — mirroring a
real BERT vocab's behavior on ASCII text.
"""

from __future__ import annotations

from functools import lru_cache

from .tokenization import (
    clean_and_split,
    is_punctuation_char,
    split_on_punctuation,
    strip_accents,
)

NEVER_SPLIT = ("[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]")
SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    f"[unused{i}]" for i in range(6)
]
MAX_CHARS_PER_WORD = 200


def basic_tokenize(text: str, do_lower_case: bool = True) -> list[str]:
    """basic_tokenizer.py:42-64 (positions dropped — unused upstream)."""
    out: list[str] = []
    for token in clean_and_split(text):
        if do_lower_case and token not in NEVER_SPLIT:
            token = strip_accents(token.lower())
        out.extend(split_on_punctuation(token))
    return out


def wordpiece(tokens: list[str], vocab: dict[str, int], unk: str = "[UNK]") -> list[str]:
    """word_piece_tokenizer.py:60-94 greedy longest-match-first."""
    out: list[str] = []
    for chars in tokens:
        if len(chars) > MAX_CHARS_PER_WORD:
            out.append(unk)
            continue
        start = 0
        subs: list[str] = []
        bad = False
        n = len(chars)
        while start < n:
            end = n
            cur = None
            while start < end:
                piece = chars[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in vocab:
                    cur = piece
                    break
                end -= 1
            if cur is None:
                bad = True
                break
            subs.append(cur)
            start = end
        out.extend([unk] if bad else subs)
    return out


def bert_tokenize(text: str, vocab: dict[str, int]) -> list[str]:
    """bert_tokenizer.py:48-54: basic -> wordpiece."""
    return wordpiece(basic_tokenize(text), vocab)


@lru_cache(maxsize=2)
def build_wordpiece_vocab() -> dict[str, int]:
    """Deterministic wordpiece vocab for the synthetic corpus: specials
    first ([PAD] = id 0 — the reference pads with literal 0,
    bert_encoder.py:95), then whole lowercase corpus words, then every
    corpus character bare and '##'-prefixed (full coverage fallback),
    then common English suffix pieces.
    """
    from .. import relations

    vocab: dict[str, int] = {}

    def add(tok: str):
        if tok not in vocab:
            vocab[tok] = len(vocab)

    for s in SPECIALS:
        add(s)
    words = relations.vocabulary_words()
    chars = sorted({c for w in words for c in w if not c.isspace()})
    # basic tokenization splits punctuation into single-char tokens
    for w in words:
        for piece in split_on_punctuation(strip_accents(w.lower())):
            add(piece)
    for c in chars:
        add(c)
        add("##" + c)
    for suf in ("##s", "##ed", "##ing", "##er", "##es", "##ly"):
        add(suf)
    return vocab
