"""The training-data product: one operator from raw transcripts to a
cleaned, deduplicated text corpus.

This is the composition the whole engine exists for at 10^12-turn scale:

    extract (text-only fast path, shuffle-free mapInPandas)
      → per-turn quality features + language-ID (pure expressions)
      → quality / language gates (predicate filters — pushdown-friendly)
      → near-duplicate removal (MinHash LSH → exact Jaccard verify →
        connected components; keeper = smallest id per group)

Every stage is individually oracled/tested elsewhere (extraction golden
+ node parity; textstats and jaccard/components DuckDB-oracled); this
module only wires them and owns the turn-id convention: a deterministic
``xxhash64(conv_id, turn_idx)`` surrogate id, so dedup keys are uniform
64-bit hashes (shuffle-friendly) and independent of physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline import extract_transcripts
from . import dedup, textstats


def turn_id(conv_col="conv_id", turn_col="turn_idx"):
    """Deterministic 64-bit surrogate id for a turn."""
    return F.xxhash64(F.col(conv_col), F.col(turn_col))


def clean_corpus(
    transcripts: DataFrame,
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    min_tokens: int = 5,
    dedup_threshold: float = 0.7,
    depara: dict | None = None,
    lsh_bands: int = 16,
    num_hashes: int = 32,
    parallelism: int | None = None,
) -> DataFrame:
    """Raw transcripts → cleaned per-turn corpus.

    Returns (conv_id, turn_idx, clean_text, lang, n_tokens,
    quality_score): extracted main content for turns that pass the
    quality floor, the language allow-list (when given), the token
    floor, and near-dup removal (the smallest-id member of each verified
    near-dup group is kept — deterministic, layout-independent).
    """
    ext = extract_transcripts(transcripts, depara=depara, with_services=False)
    turns = ext.select(
        "conv_id",
        "turn_idx",
        "clean_text",
        turn_id().alias("_tid"),
    )

    q = textstats.quality_features(turns, text_col="clean_text", id_col="_tid").select(
        F.col("id").alias("_tid"), "n_tokens", "quality_score"
    )
    turns = (
        turns.join(q, "_tid")
        .withColumn("lang", textstats.lang_id(F.col("clean_text")))
    )

    keep = (F.col("quality_score") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    if langs:
        keep = keep & F.col("lang").isin(list(langs))
    gated = turns.filter(keep)

    # stage 1: EXACT dedup (hash groupBy — one shuffle on uniform md5
    # keys). Template-heavy corpora have huge identical families; running
    # LSH over them would put a whole family into one band bucket and
    # explode it quadratically. Keep the smallest surrogate id per hash.
    hashed = gated.withColumn("_h", F.md5(dedup.normalized_text(F.col("clean_text"))))
    reps = hashed.groupBy("_h").agg(F.min("_tid").alias("_tid"))
    exact_kept = hashed.join(reps, ["_h", "_tid"]).drop("_h")

    # stage 2: near-dup over the distinct representatives only, with a
    # bucket-size cap as the skew backstop. The final keeper equals the
    # unstaged pipeline's: each representative is already its exact
    # group's min id, and components take the min across groups.
    groups = dedup.near_dup_groups(
        exact_kept.select(F.col("_tid").alias("doc_id"), F.col("clean_text").alias("text")),
        threshold=dedup_threshold,
        num_hashes=num_hashes,
        bands=lsh_bands,
        parallelism=parallelism,
        max_bucket_size=256,
    )
    losers = groups.filter(F.col("id") != F.col("comp")).select(F.col("id").alias("_tid"))
    out = exact_kept.join(losers, "_tid", "left_anti")
    return out.select("conv_id", "turn_idx", "clean_text", "lang", "n_tokens", "quality_score")
