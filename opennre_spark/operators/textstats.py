"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting. Pure Spark
SQL expressions — these run inside whole-stage codegen next to the
parquet scan (predicate pushdown + column pruning intact) — except the
winnowing rolling hash, which is a vectorized Arrow-batched numpy
kernel (r7: the per-character HOF pipeline was interpreted and 10x+
slower; see winnow_fingerprints).
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
    import numpy as np
    from pyspark.sql import types as T

    t = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )

    # r7 (guide §4.2): the per-character HOF pipeline (substr/ascii per
    # char, element_at per gram tap, slice+min per window) is
    # interpreted — CodegenFallback — and cost ~25s for 50k documents
    # at sf1.0, almost all per-element expression-eval overhead. The
    # normalization stays a JVM regex; the rolling hash + window-min
    # moves into ONE vectorized numpy pass per Arrow batch: byte codes
    # via frombuffer, the k-gram polynomial as four shifted int64
    # multiply-adds, window minima as elementwise minimum of the four
    # shifted gram arrays, distinct via np.unique. Exact 64-bit integer
    # arithmetic, identical fingerprint SETS per document (np.unique
    # sorts where array_distinct kept first-occurrence order — row
    # order is not part of the contract), so the bit-exact DuckDB
    # oracle is unchanged. Narrow (zero-exchange), same as before.
    staged = docs.select(F.col(id_col), t.alias("__t"))
    id_field = staged.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("fp", T.LongType(), False)]
    )
    b3, b2, b1 = base**3, base**2, base

    def run(batches):
        import pyarrow as pa

        for rb in batches:
            texts = rb.column("__t").to_pylist()
            idx: list[int] = []
            parts: list[np.ndarray] = []
            for i, s in enumerate(texts):
                bs = s.encode("utf-8")  # normalized to [a-z0-9 ]: 1 byte/char
                L = len(bs)
                if L < k:
                    continue
                c = np.frombuffer(bs, dtype=np.uint8).astype(np.int64)
                g = c[: L - 3] * b3 + c[1 : L - 2] * b2 + c[2 : L - 1] * b1 + c[3:]
                if len(g) >= window:
                    fp = np.unique(
                        np.minimum(
                            np.minimum(g[:-3], g[1:-2]),
                            np.minimum(g[2:-1], g[3:]),
                        )
                    )
                else:
                    fp = g.min(keepdims=True)
                idx.extend([i] * len(fp))
                parts.append(fp)
            if not parts:
                continue
            take = pa.array(np.asarray(idx, dtype=np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(id_col).take(take),
                    pa.array(np.concatenate(parts), type=pa.int64()),
                ],
                names=[id_col, "fp"],
            )

    return staged.mapInArrow(run, schema=out_schema)


def _stats_struct(tv: Column, t: Column) -> Column:
    """All token-derived stats as ONE struct over the BOUND token array
    `tv` — field expressions identical to the public per-column
    functions, with `tv` replacing their own `_tokens(t)`."""
    n = F.size(tv)
    stops_en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_ratio = (
        F.size(F.filter(tv, lambda tok: F.array_contains(stops_en, tok))).cast(
            "double"
        )
        / n
    )
    len_score = F.least(n.cast("double") / 20.0, F.lit(1.0))
    distinct_ratio = F.size(F.array_distinct(tv)).cast("double") / n
    quality = F.round(
        0.3 * len_score
        + 0.3 * alpha_ratio(t)
        + 0.2 * sw_ratio
        + 0.2 * distinct_ratio,
        6,
    )
    hit_structs = F.array(
        *[
            F.struct(
                F.size(
                    F.filter(
                        tv,
                        (lambda stops: lambda tok: F.array_contains(stops, tok))(
                            F.array(*[F.lit(w) for w in STOPWORDS[lang]])
                        ),
                    )
                ).alias("hits"),
                F.lit(i).alias("ord"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(STOPWORDS)
        ]
    )
    best = F.array_max(
        F.transform(
            hit_structs,
            lambda s: F.struct(
                s["hits"].alias("hits"),
                (-s["ord"]).alias("nord"),
                s["lang"].alias("lang"),
            ),
        )
    )
    lang_pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return F.struct(
        n.cast("long").alias("n_tokens"),
        sw_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
        lang_pred.alias("lang_pred"),
        F.concat_ws(" ", tv).alias("norm_text"),
    )


def document_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document stat table.

    r7 (guide §1.2): the token-derived columns share ONE evaluation of
    the token array — the per-column functions each inlined their own
    `_tokens` split into interpreted filter HOFs, so the split ran once
    per column. The bound stats struct is evaluated in a Generate node
    (`inline(array(struct))`), which projection collapse cannot
    duplicate; its fields land as real attributes. Values identical
    column for column."""
    from .hof import hof_let

    t = F.col(text_col)
    stats = hof_let(_tokens(t), lambda tv: _stats_struct(tv, t))
    expanded = docs.select(
        F.col(id_col),
        bpe_ish_token_count(t).alias("n_pieces"),
        F.length(t).cast("long").alias("n_chars"),
        alpha_ratio(t).alias("alpha_ratio"),
        F.inline(F.array(stats)),
    )
    return expanded.select(
        id_col,
        "n_tokens",
        "n_pieces",
        "n_chars",
        "alpha_ratio",
        "stopword_ratio",
        "quality",
        "lang_pred",
        F.xxhash64("norm_text").alias("fingerprint"),
    )
