"""Text-analysis column expressions: tokenization, counts, shingles.

All Catalyst built-ins (split/transform/filter/slice/concat) — the
tokenizer is a single-space split to stay bit-identical with SQL
oracles (``string_split(text, ' ')``); a regex variant is provided for
real-world whitespace. These run inside codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small function-word marker sets used by the heuristic language
# identifier (operators/text_analysis.py). Deliberately tiny and
# hard-coded: they are part of the deterministic query contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}

# Stopwords for quality scoring — fixed, engine-portable.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space split, empty tokens removed).

    ``array_remove(x, '')`` rather than ``filter(x, t -> t != '')``:
    identical semantics (split never yields nulls), but array_remove
    is a plain expression that stays inside whole-stage codegen while
    lambda-bearing higher-order functions are CodegenFallback.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(c, " "), "")


def tokens_regex(col: Column | str) -> Column:
    """Tokens on arbitrary whitespace runs (regex split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(c, "\\s+"), "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_shingles(col: Column | str, k: int) -> Column:
    """All character k-grams of a string column.

    Pure built-ins: substring at each start offset. Returns an empty
    array for strings shorter than k. (The transform lambda is
    CodegenFallback like all higher-order functions, but the per-row
    work is O(len) substrings — the downstream explode + hash + agg
    dominate and those are codegen'd.)
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.substring(c, i, k))


def word_shingles(toks: Column, k: int) -> Column:
    """All k-word shingles of a token array, space-joined.

    Pure built-ins: for i in 0..len-k, concat(slice(toks, i+1, k)).
    Returns an empty array when the document has fewer than k tokens.
    """
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
