"""Word-level tokenization with the exact semantics of the reference
tokenizer stack (cited below), re-implemented from scratch.

Reference semantics (all /root/reference):
  - clean_text              opennre/tokenization/utils.py:85-95
  - whitespace/control/punct predicates  utils.py:9-43
  - tokenize_chinese_chars  utils.py:121-132 (CJK ranges 45-64)
  - split_on_whitespace     utils.py:97-104
  - convert_by_vocab        utils.py:186-202 (lowercase, UNK fallback,
                            truncate/pad to max_seq_length with blank_id)
  - WordTokenizer.tokenize  opennre/tokenization/word_tokenizer.py:39-64
    = clean_text -> tokenize_chinese_chars -> split_on_whitespace

Implementation notes: character classification is memoized in
module-level caches so repeated batches over similar text pay ~0 for
classification; the hot path is therefore dict lookups, suitable for
calling from inside Arrow-batched UDFs.
"""

from __future__ import annotations

import sys
import unicodedata
from functools import lru_cache

# CJK Unified Ideograph blocks (utils.py:55-62).
_CJK_RANGES = (
    (0x4E00, 0x9FFF),
    (0x3400, 0x4DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF),
    (0x2F800, 0x2FA1F),
)


def is_cjk_codepoint(cp: int) -> bool:
    for lo, hi in _CJK_RANGES:
        if lo <= cp <= hi:
            return True
    return False


@lru_cache(maxsize=None)
def _char_class(ch: str) -> int:
    """0 = keep verbatim, 1 = map to space, 2 = drop, 3 = CJK (space-pad).

    Mirrors utils.py:9-30 + 85-95: NUL/U+FFFD/control(C*) dropped, with
    tab/newline/CR treated as whitespace; Zs and ASCII whitespace map to
    a single space; CJK ideographs get padded with spaces on both sides
    (utils.py:121-132).
    """
    cp = ord(ch)
    if ch in (" ", "\t", "\n", "\r"):
        return 1
    if cp == 0 or cp == 0xFFFD:
        return 2
    cat = unicodedata.category(ch)
    if cat.startswith("C"):
        return 2
    if cat == "Zs":
        return 1
    if is_cjk_codepoint(cp):
        return 3
    return 0


import re

# Printable ASCII + the three ASCII whitespace controls: for such text
# clean_text is the identity (no NUL/U+FFFD/control/Zs beyond ' '),
# there are no CJK codepoints, and split_on_whitespace == str.split.
_SIMPLE_ASCII = re.compile(r"^[\x20-\x7e\t\n\r]*$")


def clean_and_split(text: str) -> list[str]:
    """WordTokenizer.tokenize: clean -> CJK pad -> whitespace split.

    Equivalent to word_tokenizer.py:53-64 composed with utils.py:85-95
    and 121-132; a single pass here instead of three string rebuilds,
    with an exact str.split() fast path for printable-ASCII text (the
    overwhelmingly common case in the hot scoring loop).
    """
    if _SIMPLE_ASCII.match(text):
        return text.split()
    parts: list[str] = []
    buf: list[str] = []
    for ch in text:
        cls = _char_class(ch)
        if cls == 0:
            buf.append(ch)
        elif cls == 3:  # CJK: standalone token boundary on both sides
            if buf:
                parts.append("".join(buf))
                buf = []
            parts.append(ch)
        else:
            # whitespace (1) and dropped chars (2) differ: dropped chars
            # join their neighbours (utils.py:89-90 `continue`), while
            # whitespace splits. Only split on whitespace.
            if cls == 1 and buf:
                parts.append("".join(buf))
                buf = []
    if buf:
        parts.append("".join(buf))
    return parts


def tokens_to_ids(
    tokens: list[str],
    vocab: dict[str, int],
    max_seq_length: int | None = None,
    blank_id: int = 0,
    unk_id: int = 1,
    uncased: bool = True,
) -> list[int]:
    """convert_by_vocab semantics (utils.py:186-202)."""
    get = vocab.get
    if uncased:
        out = [get(t.lower(), unk_id) for t in tokens]
    else:
        out = [get(t, unk_id) for t in tokens]
    if max_seq_length is not None:
        if len(out) > max_seq_length:
            out = out[:max_seq_length]
        else:
            out.extend([blank_id] * (max_seq_length - len(out)))
    return out


def is_punctuation_char(ch: str) -> bool:
    """utils.py:32-43: ASCII symbol ranges or Unicode P* category."""
    cp = ord(ch)
    if 33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126:
        return True
    return unicodedata.category(ch).startswith("P")


def split_on_punctuation(text: str) -> list[str]:
    """utils.py:106-119: each punctuation char becomes its own token."""
    out: list[str] = []
    buf: list[str] = []
    for ch in text:
        if is_punctuation_char(ch):
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(ch)
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def strip_accents(text: str) -> str:
    """utils.py:134-143: NFD-normalize then drop combining marks."""
    return "".join(
        ch
        for ch in unicodedata.normalize("NFD", text)
        if unicodedata.category(ch) != "Mn"
    )
