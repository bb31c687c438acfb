"""Benchmark decontamination: word n-gram overlap against a probe set.

The standard training-data hygiene pass (GPT-3 appendix C / Dolma-style):
before training, every document is checked for word n-gram collisions
with the evaluation/benchmark suite, and contaminated documents are
dropped or flagged. The reference engine has no analogue (it is a
document-extraction service); this operator belongs to the
training-data-pipeline axis the engine serves.

Shape, Spark-first:

* the PROBE side (the benchmark suite) is small by construction — MBs of
  eval sets against a corpus of TBs — so its distinct n-grams are
  **broadcast** and the corpus side joins map-side: the only shuffle in
  the whole pass carries the matched ``(doc_id, n-gram)`` hit pairs,
  bounded by true contamination volume, never by corpus size;
* the corpus side is shingle → explode → broadcast-hash join — one scan,
  no corpus-vs-corpus pairing anywhere;
* at real scale pass ``hashed=True``: both sides join on
  ``xxhash64(n-gram)`` so an exploded row is 16 bytes instead of an
  n-word string (the string form is the default because it is
  engine-portable — the DuckDB oracle gate replays it verbatim).

Tokenization is the repo's shared dedup basis (``normalized_text`` →
whitespace split; ``shingles`` word k-grams with the whole-text fallback
for short docs) so decontamination, MinHash and Jaccard all agree on
what an n-gram is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def _gram_col(col, n: int):
    """Distinct word n-grams of a text column (array<string>)."""
    return F.array_distinct(shingles(col, n))


def probe_ngrams(
    probes: DataFrame, text_col: str = "text", n: int = 8, hashed: bool = False
) -> DataFrame:
    """Distinct n-grams over the whole probe set → 1-column table ``g``
    (string, or bigint xxhash64 when ``hashed``). This is the broadcast
    side: its row count is bounded by benchmark-suite volume."""
    g = F.explode(_gram_col(F.col(text_col), n)).alias("g")
    out = probes.select(g).distinct()
    if hashed:
        out = out.select(F.xxhash64("g").alias("g")).distinct()
    return out


def contamination(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
    hashed: bool = False,
    probe_text_col: str = "text",
) -> DataFrame:
    """Per-document contamination report:
    ``(doc_id, n_hits, n_ngrams, contamination_ratio)`` for every doc
    with at least ``min_hits`` n-grams shared with the probe set.

    ``n_ngrams`` counts the doc's DISTINCT n-grams, ``n_hits`` how many
    of those appear anywhere in the probe set, ``contamination_ratio``
    their quotient — the quantity decontamination policies threshold on.
    ``probe_text_col`` names the PROBE table's text column (benchmark
    suites rarely share the corpus schema — e.g. clean_corpus checks its
    ``clean_text`` turns against a probe table's ``text``).
    """
    pg = F.broadcast(probe_ngrams(probes, text_col=probe_text_col, n=n, hashed=hashed))
    grams = docs.select(
        F.col(id_col).alias("doc_id"), _gram_col(F.col(text_col), n).alias("_gs")
    )
    exploded = grams.select(
        "doc_id", F.size("_gs").alias("n_ngrams"), F.explode("_gs").alias("g")
    )
    if hashed:
        exploded = exploded.withColumn("g", F.xxhash64("g"))
    hits = (
        exploded.join(pg, "g")
        .groupBy("doc_id", "n_ngrams")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.filter(F.col("n_hits") >= min_hits).select(
        "doc_id",
        "n_hits",
        "n_ngrams",
        F.round(F.col("n_hits") / F.col("n_ngrams"), 6).alias("contamination_ratio"),
    )


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    max_ratio: float = 0.0,
    max_hits: int | None = None,
    hashed: bool = True,
    probe_text_col: str = "text",
) -> DataFrame:
    """Drop contaminated documents: keep docs whose probe overlap stays
    at or under BOTH thresholds (``max_ratio`` on the distinct-n-gram
    ratio; ``max_hits`` absolute, unlimited when None). Defaults are the
    strict policy — any overlap drops the doc — with the hashed join
    (this is the production path; the string form exists for the oracle).

    Implemented as contamination → broadcast-able anti-join on doc_id:
    the flagged-id table is small (contaminated docs, not the corpus),
    so the final anti-join is map-side too."""
    flagged = contamination(
        docs, probes, text_col=text_col, id_col=id_col, n=n, min_hits=1,
        hashed=hashed, probe_text_col=probe_text_col,
    )
    cond = F.col("contamination_ratio") > F.lit(max_ratio)
    if max_hits is not None:
        cond = cond | (F.col("n_hits") > F.lit(max_hits))
    drop_ids = flagged.filter(cond).select(F.col("doc_id").alias("_drop_id"))
    return docs.join(
        F.broadcast(drop_ids),
        on=docs[id_col] == F.col("_drop_id"),
        how="left_anti",
    )
