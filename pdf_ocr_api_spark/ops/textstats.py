"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all JVM-side expressions (no UDFs), suitable for
a 100 TB corpus sweep (single scan, map-side only until the final agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text, shingles

# tiny stopword banks for the n-gram/stopword langid heuristic
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "es": r"\b(el|la|los|las|de|que|y)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|des|et|est)\b",
    "pt": r"\b(o|a|os|as|de|que|nao|uma)\b",  # accent-folded basis
}

_PUNCT = r"[.,;:!?…]"
_STOPWORDS_PT_EN = r"\b(the|and|of|o|a|de|que|e|do|da)\b"


def tokens(col):
    return F.split(normalized_text(col), " ")


def token_count(col):
    """Whitespace token count (0 for empty AND null — a null-text row
    must not leak size()'s -1/null through a quality metric)."""
    n = normalized_text(F.coalesce(col, F.lit("")))
    return F.when(n == "", 0).otherwise(F.size(F.split(n, " ")))


def bpe_ish_token_count(col):
    """A BPE-ish proxy: alnum runs + punctuation marks each count as one
    token (regexp-driven, stays in codegen). Null-safe like token_count —
    size() of a null array is -1 (or null under ANSI) and must not leak
    into token metrics."""
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(r"[A-Za-zÀ-ÿ0-9]+|[^A-Za-zÀ-ÿ0-9\s]"), 0)
    )


_ACC_SRC = "áàâãäéèêëíìîïóòôõöúùûüçñ"
_ACC_DST = "aaaaaeeeeiiiiooooouuuucn"


def _marker_basis(col):
    """lower + accent-fold: with only ASCII left, Java's Unicode-aware
    \b and RE2's ASCII \b agree — markers like 'não' fold to 'nao'
    and match identically in the Spark expr and the DuckDB oracle."""
    return F.translate(F.lower(F.coalesce(col, F.lit(""))), _ACC_SRC, _ACC_DST)


def lang_scores(col):
    """Marker-hit counts per language → map<string,int>-like struct."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(_marker_basis(col), F.lit(rx), 0)).alias(lang)
            for lang, rx in LANG_MARKERS.items()
        ]
    )


def lang_id(col):
    """argmax over marker scores; 'und' when all zero. Deterministic
    tie-break = LANG_MARKERS declaration order."""
    scores = [(lang, F.size(F.regexp_extract_all(_marker_basis(col), F.lit(rx), 0))) for lang, rx in LANG_MARKERS.items()]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in scores:
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / digit ratios + a composite
    quality score in [0,1]."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(_PUNCT), 0))
    n_stop = F.size(F.regexp_extract_all(_marker_basis(c), F.lit(_STOPWORDS_PT_EN), 0))
    n_digit = F.size(F.regexp_extract_all(c, F.lit(r"\d"), 0))

    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))

    # boilerpipe-flavored composite: long enough, words not too long,
    # some stopwords, not digit/punct soup
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.2).otherwise(0.0)
        + F.least(stop_ratio * 2, F.lit(0.2))
        + F.when(punct_ratio <= 0.1, 0.1).otherwise(0.0)
        + F.when(digit_ratio <= 0.3, 0.1).otherwise(0.0)
    )

    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def fingerprint(col, k: int = 5, keep: int = 8):
    """Winnowing-style document fingerprint: the ``keep`` smallest
    xxhash64 values over word k-grams (rolling-hash analogue), sorted —
    an order-insensitive near-dup key."""
    hashes = F.transform(shingles(col, k), lambda s: F.xxhash64(s))
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep)


def md5_fingerprint(col):
    """Exact content fingerprint over normalized text."""
    return F.md5(normalized_text(col))
