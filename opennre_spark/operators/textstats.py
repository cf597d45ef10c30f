"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting. All pure
Spark SQL expressions — these run inside whole-stage codegen next to
the parquet scan (predicate pushdown + column pruning intact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu", "mit", "von"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans", "avec"],
}


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (T3-equivalent counting)."""
    return F.size(_tokens(text_col)).cast("long")


def bpe_ish_token_count(text_col: Column) -> Column:
    """Sub-word-ish token estimate: splits on whitespace, punctuation
    boundaries and letter/digit transitions — a deterministic stand-in
    for a BPE tokenizer's piece count (regex, JVM-side).
    """
    pieces = F.split(
        F.trim(text_col),
        r"(\s+)|(?<=[a-zA-Z])(?=\d)|(?<=\d)(?=[a-zA-Z])|(?<=[^\sa-zA-Z0-9])|(?=[^\sa-zA-Z0-9])",
    )
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0)).cast("long")


def stopword_ratio(text_col: Column, lang: str = "en") -> Column:
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = _tokens(text_col)
    return (
        F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).cast("double")
        / F.size(toks)
    )


def alpha_ratio(text_col: Column) -> Column:
    return (
        F.length(F.regexp_replace(text_col, "[^a-zA-Z]", "")).cast("double")
        / F.length(text_col)
    )


def quality_score(text_col: Column) -> Column:
    """Composite [0,1] quality heuristic: balanced length, alphabetic
    density, stopword presence, low repetition (distinct-token ratio).
    Deterministic; weights are fixed documentation, not learned.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    len_score = F.least(n.cast("double") / 20.0, F.lit(1.0))
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    return F.round(
        0.3 * len_score
        + 0.3 * alpha_ratio(text_col)
        + 0.2 * stopword_ratio(text_col)
        + 0.2 * distinct_ratio,
        6,
    )


def _stop_hits(toks: Column, lang: str) -> Column:
    """Count of tokens in the given language's stopword list.
    NB: a closure factory, not a default-arg lambda — pyspark counts a
    lambda's parameters (defaults included) to pick the higher-order
    function arity, so `lambda t, l=l:` would silently bind the element
    index to l."""
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))


def lang_scores(text_col: Column) -> Column:
    """map<lang, hits>: stopword-list vote counts per language."""
    toks = _tokens(text_col)
    return F.map_from_arrays(
        F.array(*[F.lit(l) for l in STOPWORDS]),
        F.array(*[_stop_hits(toks, l) for l in STOPWORDS]),
    )


def detect_lang(text_col: Column) -> Column:
    """argmax language by stopword hits, 'und' (undetermined) on zero
    hits; ties broken by language-key order (deterministic)."""
    toks = _tokens(text_col)
    hit_structs = F.array(
        *[
            F.struct(
                _stop_hits(toks, l).alias("hits"),
                F.lit(i).alias("ord"),
                F.lit(l).alias("lang"),
            )
            for i, l in enumerate(STOPWORDS)
        ]
    )
    best = F.array_max(
        F.transform(
            hit_structs,
            lambda s: F.struct(
                s["hits"].alias("hits"), (-s["ord"]).alias("nord"), s["lang"].alias("lang")
            ),
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text_col: Column) -> Column:
    """64-bit content fingerprint: xxhash64 over the whitespace-
    normalized, lowercased text (stable under whitespace jitter)."""
    return F.xxhash64(F.concat_ws(" ", _tokens(text_col)))


def fingerprint_md5(text_col: Column) -> Column:
    """Cross-engine fingerprint variant: md5 hex of the same
    whitespace-normalized text (xxhash64 is Spark-only; md5 hex strings
    agree with DuckDB, which makes this the oracle-checkable rendition)."""
    return F.md5(F.concat_ws(" ", _tokens(text_col)))


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
    base: int = 257,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS local-fingerprinting
    scheme: Schleimer/Wilkerson/Aiken, SIGMOD'03): polynomial rolling
    hashes over character k-grams of the normalized text, then the
    minimum hash of every sliding window of `window` consecutive grams,
    deduplicated — a content-overlap sketch that is robust to
    insertions/reordering where a whole-document hash is not.

    Everything is JVM-side higher-order functions over one normalized
    string column — whole-stage codegen, no shuffle, no Python. The
    polynomial hash is exact 64-bit arithmetic (max code 122 with
    base 257, k=4 -> < 2^32), so the identical expression is evaluable
    in DuckDB for the oracle.

    Normalization: lowercase, strip everything outside [a-z0-9 ],
    collapse runs of spaces, trim. Documents shorter than k characters
    produce no fingerprints; documents with fewer than `window` grams
    produce exactly one (the global minimum) — the standard winnowing
    boundary rules.

    Returns (id_col, fp long), one row per distinct fingerprint.
    """
    t = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    empty = F.array().cast("array<bigint>")
    staged = docs.select(F.col(id_col), t.alias("__t")).select(
        id_col, "__t", F.length("__t").alias("__L")
    )
    codes = F.transform(
        F.sequence(F.lit(1), F.col("__L")),
        lambda i: F.ascii(F.col("__t").substr(i, F.lit(1))).cast("long"),
    )
    staged = staged.withColumn(
        "__codes", F.when(F.col("__L") >= k, codes).otherwise(empty)
    )

    def gram_at(p):
        e = F.lit(0).cast("long")
        for i in range(k):
            e = e * base + F.element_at(F.col("__codes"), (p + i).cast("int"))
        return e

    grams = F.transform(F.sequence(F.lit(1), F.col("__L") - k + 1), gram_at)
    staged = staged.withColumn(
        "__grams", F.when(F.col("__L") >= k, grams).otherwise(empty)
    ).withColumn("__G", F.size("__grams"))
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("__G") - window + 1),
            lambda i: F.array_min(F.slice(F.col("__grams"), i, window)),
        )
    )
    fps = (
        F.when(F.col("__G") >= window, wins)
        .when(F.col("__G") >= 1, F.array(F.array_min("__grams")))
        .otherwise(empty)
    )
    return staged.select(id_col, F.explode(fps).alias("fp"))


def document_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document stat table."""
    t = F.col(text_col)
    return docs.select(
        id_col,
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_pieces"),
        F.length(t).cast("long").alias("n_chars"),
        alpha_ratio(t).alias("alpha_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        detect_lang(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
