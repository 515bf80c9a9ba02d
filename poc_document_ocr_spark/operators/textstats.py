"""Text-analysis operators: token counts, quality ratios, language-marker
identification, content fingerprints.

All pure column expressions over built-in functions — the hot path stays in
whole-stage codegen, no Python. Each operator is a ``DataFrame → DataFrame``
so the same code path serves the per-document corpus table and the per-turn
extracted-content table.

Scale notes: every operator here is map-only (no shuffle); at 100 TB the
cost is exactly one scan with column pruning down to (id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "LANG_MARKERS",
    "token_stats",
    "lang_id",
    "fingerprint",
    "quality_score",
    "winnow_fingerprints",
]

#: small closed stopword list for quality scoring (shared with the oracle)
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)

#: per-language marker word sets for the n-gram/function-word heuristic;
#: deterministic priority order breaks ties (first wins)
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "is")),
    ("es", ("el", "la", "los", "que")),
    ("fr", ("le", "la", "les", "est")),
    ("de", ("der", "die", "und", "ist")),
)


def _tokens(text_col: Column) -> Column:
    return F.split(text_col, " ")


def token_stats(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document token/quality stats.

    Columns: ``n_chars, n_tokens, n_alpha_chars, avg_token_len,
    stopword_ratio`` — the standard cheap quality-score inputs (length,
    punctuation share, stopword share).
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    # chars excluding separators
    n_nonspace = F.length(F.regexp_replace(text, " ", "")).cast("long")
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_alpha.alias("n_alpha_chars"),
        (n_nonspace / n_tokens).alias("avg_token_len"),
        (n_stop / n_tokens).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic.

    Scores each language by marker-token hits; argmax with deterministic
    tie-break on ``LANG_MARKERS`` order. Columns: ``pred_lang`` plus one
    ``hits_<lang>`` per language.
    """
    toks = _tokens(F.col(text_col))

    def _hits(markers: tuple[str, ...]):
        return F.size(
            F.filter(toks, lambda t: F.lower(t).isin(*markers))
        ).cast("long")

    hit_cols = {lang: _hits(markers) for lang, markers in LANG_MARKERS}
    # argmax with first-wins tie-break: strictly-greater-than-all-previous
    best = F.lit(LANG_MARKERS[0][0])
    best_hits = hit_cols[LANG_MARKERS[0][0]]
    for lang, _ in LANG_MARKERS[1:]:
        cond = hit_cols[lang] > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hit_cols[lang]).otherwise(best_hits)
    return df.select(
        F.col(id_col),
        *[hit_cols[lang].alias(f"hits_{lang}") for lang, _ in LANG_MARKERS],
        best.alias("pred_lang"),
    )


#: Gopher-style quality-filter bounds (deterministic, shared with the
#: DuckDB oracle and the tests)
QUALITY_RULES = {
    "min_tokens": 5,
    "max_tokens": 100_000,
    "min_avg_token_len": 2.0,
    "max_avg_token_len": 12.0,
    "max_punct_ratio": 0.30,
    "max_digit_ratio": 0.50,
}


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Training-data quality filter signals + the keep/drop verdict.

    Character-class ratios (punctuation, digits, uppercase) over total
    characters plus the token-shape bounds of ``QUALITY_RULES`` — the
    standard cheap heuristics a corpus-cleaning pass applies before
    expensive model-based filtering. Map-only; ``keep`` is a plain boolean
    column so the filter pushes into any downstream scan.
    """
    text = F.col(text_col)
    n_chars = F.length(text).cast("long")
    toks = _tokens(text)
    n_tokens = F.size(toks).cast("long")
    n_nonspace = F.length(F.regexp_replace(text, " ", "")).cast("long")
    n_punct = F.length(
        F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    ).cast("long")
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", "")).cast("long")
    n_upper = F.length(F.regexp_replace(text, "[^A-Z]", "")).cast("long")
    avg_tok = n_nonspace / n_tokens
    punct_ratio = n_punct / n_chars
    digit_ratio = n_digit / n_chars
    r = QUALITY_RULES
    keep = (
        (n_tokens >= r["min_tokens"])
        & (n_tokens <= r["max_tokens"])
        & (avg_tok >= r["min_avg_token_len"])
        & (avg_tok <= r["max_avg_token_len"])
        & (punct_ratio <= r["max_punct_ratio"])
        & (digit_ratio <= r["max_digit_ratio"])
    )
    return df.select(
        F.col(id_col),
        n_punct.alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        (n_upper / n_chars).alias("upper_ratio"),
        avg_tok.alias("avg_token_len"),
        keep.alias("keep"),
    )


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme).

    Hash every character ``k``-gram, slide a window of ``w`` hashes, keep
    each window's minimum, emit the distinct selected hashes — guarantees
    any shared substring of length ≥ ``k + w - 1`` contributes at least one
    matching fingerprint between two documents, at ~1/w storage of full
    shingling. Hashes are md5 hex compared lexicographically (identical
    across engines); documents shorter than ``k + w - 1`` yield no rows.
    Map-side higher-order functions; the output (id, fp) table joins on fp
    for plagiarism/overlap detection at corpus scale.
    """
    grams = (
        f"transform(sequence(1, length({text_col}) - {k} + 1), "
        f"i -> md5(substring({text_col}, i, {k})))"
    )
    # gram hashes materialize as a column FIRST so the window pass refers
    # to them by name — inlining the transform would re-hash every gram
    # once per window (O(n·w) becomes O(n²))
    wins = (
        f"transform(sequence(0, size(_gh) - {w}), "
        f"j -> array_min(slice(_gh, j + 1, {w})))"
    )
    return (
        df.filter(F.length(F.col(text_col)) >= k + w - 1)
        .select(F.col(id_col), F.expr(grams).alias("_gh"))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(F.expr(wins))).alias("fp"),
        )
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: md5 over lowercased
    whitespace-collapsed text (the exact-dup key robust to case/spacing).
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.substring(F.md5(norm), 1, 8).alias("fingerprint_short"),
    )
