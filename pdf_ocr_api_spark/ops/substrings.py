"""Exact substring deduplication (Lee et al. 2021, arXiv:2107.06499).

Document-level dedup (ops/dedup.py) removes whole near-identical
documents; this operator removes *duplicated passages* — a license
block, a quoted article, a templated disclaimer — that repeat inside
otherwise-distinct documents.  The paper's property: every duplicated
token span of at least ``width`` tokens loses all but one occurrence
corpus-wide.

The paper builds a corpus suffix array; that is a single-machine
construction.  The distributed re-expression used here is the standard
windowed form: every duplicated span of ≥ ``width`` tokens contains,
at every alignment, a duplicated ``width``-token window — so stride-1
window fingerprints + window-level keep-one removal remove exactly the
duplicated-span occurrences (up to window-boundary slack at span edges,
< ``width`` tokens, documented below).  Spans shorter than ``width``
survive by design — ``width`` IS the paper's minimum match length
(their default: 50 tokens).

Plan shape (all keys uniform by construction — no skew surface):

1. tokenize + TWO independently-seeded per-token ``xxhash64`` streams
   JVM-side, then ONE vectorized numpy pass per Arrow batch computes
   stride-1 polynomial rolling hashes over each token-hash array —
   O(tokens), uint64 ring math (odd multiplier is invertible mod
   2^64) → a true 128-bit fingerprint: a false window match needs
   simultaneous collisions in two independent 64-bit token-hash
   streams (seeding matters — two rings over ONE token-hash stream
   would share every token-level collision);
2. ONE shuffle on the fingerprint: occurrence count and the canonical
   keeper ``min (id, pos)`` are WINDOW aggregates over
   ``partitionBy(h1, h2)``, so the token-scale window table streams
   through exactly once — never cached, never consumed twice (the
   bake-off vs the groupBy+join-back and cached forms is in BENCH.md);
3. non-keeper occurrences of ≥ ``min_count`` fingerprints regroup per
   document (small by construction — only true repeats);
4. per-document rebuild: numpy interval marking (+1/-1 diff array,
   cumsum > 0 = covered token) drops covered tokens; ONLY affected
   documents are rewritten (untouched documents keep their original
   bytes — rebuilds are whitespace-normalized, documented).

Nothing is collected to the driver; the duplicated-fingerprint set is
filtered BEFORE the join-back, so only true repeats flow through
stages 3-4.

Matching is case- and whitespace-token-exact (Java ``\\s`` ASCII
tokenizer): exact substring dedup means exact.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Python twin of the JVM tokenizer (Java \s = ASCII whitespace class):
# the rebuild MUST tokenize exactly like window_fingerprints did, or
# cut positions drift
_WS_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")

__all__ = [
    "window_fingerprints",
    "dedup_substrings",
    "substring_dup_stats",
    "substring_index",
    "dedup_substrings_incremental",
    "update_substring_index",
]

# two independent odd multipliers (random 64-bit, fixed for
# reproducibility across runs and stores)
_A1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
_A2 = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime_2 (odd)


def _rolling(th: np.ndarray, width: int, a: np.uint64) -> np.ndarray:
    """Stride-1 polynomial window hashes H(i) = Σ_j th[i+j]·a^(W-1-j)
    over the uint64 ring, O(T) via prefix sums with the modular inverse
    of ``a`` (odd → invertible mod 2^64).  numpy uint64 arithmetic
    wraps silently, which here is exactly the ring semantics wanted."""
    t = len(th)
    n = t - width + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    ainv = np.uint64(pow(int(a), -1, 1 << 64))
    with np.errstate(over="ignore"):
        # a^1..a^t and ainv^0..ainv^(t-1)
        apow = np.multiply.accumulate(np.full(t, a, dtype=np.uint64))
        ainvp = np.empty(t, dtype=np.uint64)
        ainvp[0] = np.uint64(1)
        if t > 1:
            ainvp[1:] = np.multiply.accumulate(
                np.full(t - 1, ainv, dtype=np.uint64)
            )
        # Q[k] = Σ_{j<k} th[j]·ainv^j ; H(i) = (Q[i+W]-Q[i])·a^(i+W-1)
        q = np.zeros(t + 1, dtype=np.uint64)
        np.add.accumulate(th * ainvp, out=q[1:])
        return (q[width:] - q[:-width]) * apow[width - 1 :]


def _tokens_col(text_col: str):
    """Case-preserving repo-convention tokenizer (exact substring dedup
    means exact — no lowercasing)."""
    from .textstats import ws_tokens

    return ws_tokens(F.col(text_col), lower=False)


def window_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", width: int = 50
) -> DataFrame:
    """(id, pos, h1, h2): the 128-bit fingerprint of every stride-1
    ``width``-token window of every document.  ``pos`` is the 0-based
    token index of the window start.  Documents shorter than ``width``
    tokens emit no rows (they cannot contain a ≥width dup span)."""
    if width < 2:
        raise ValueError("width must be ≥ 2")
    # the two rings consume INDEPENDENTLY-seeded per-token hashes — if
    # both rolled the same 64-bit token hash, a single token-level
    # xxhash64 collision (a few-percent birthday event among 10^9+
    # distinct tokens) would defeat both rings at once and delete a
    # never-duplicated span; with separate seeds a false window match
    # needs simultaneous collisions in two independent 64-bit streams
    toks = df.select(
        F.col(id_col).alias("id"),
        F.transform(_tokens_col(text_col), lambda t: F.xxhash64(t)).alias("_th"),
        F.transform(
            _tokens_col(text_col), lambda t: F.xxhash64(t, F.lit(0x5EED))
        ).alias("_th2"),
    )

    def _fp(batches):
        for b in batches:
            ids, poss, h1s, h2s = [], [], [], []
            for i, th_list, th2_list in zip(b["id"], b["_th"], b["_th2"]):
                th = np.asarray(th_list, dtype=np.int64).view(np.uint64)
                w1 = _rolling(th, width, _A1)
                if len(w1) == 0:
                    continue
                th2 = np.asarray(th2_list, dtype=np.int64).view(np.uint64)
                w2 = _rolling(th2, width, _A2)
                ids.append(np.full(len(w1), i, dtype=object))
                poss.append(np.arange(len(w1), dtype=np.int64))
                h1s.append(w1.view(np.int64))
                h2s.append(w2.view(np.int64))
            if not ids:
                yield pd.DataFrame({"id": [], "pos": [], "h1": [], "h2": []})
                continue
            yield pd.DataFrame(
                {
                    "id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "h1": np.concatenate(h1s),
                    "h2": np.concatenate(h2s),
                }
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return toks.mapInPandas(
        _fp, f"id {id_t}, pos LONG, h1 LONG, h2 LONG"
    )


def substring_dup_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    width: int = 50, min_count: int = 2,
) -> DataFrame:
    """Audit view: one row per duplicated window fingerprint —
    (h1, h2, n_occurrences, n_docs, keeper_id, keeper_pos)."""
    wins = window_fingerprints(df, text_col, id_col, width)
    return (
        wins.groupBy("h1", "h2")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("id").alias("n_docs"),
            F.min(F.struct("id", "pos")).alias("_k"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .select(
            "h1", "h2", "n_occurrences", "n_docs",
            F.col("_k.id").alias("keeper_id"),
            F.col("_k.pos").alias("keeper_pos"),
        )
    )


def dedup_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 50,
    min_count: int = 2,
    reliable_checkpoint_dir: str | None = None,
) -> DataFrame:
    """Remove all-but-one occurrence of every duplicated ≥``width``-token
    span, corpus-wide.  Returns the input schema with ``text_col``
    rewritten plus ``n_tokens_removed``.

    The kept occurrence is deterministic and layout-independent: the
    minimum ``(id, pos)`` per window fingerprint.  ``id_col`` must be
    unique per row (duplicate ids would merge the duplicates' cut
    lists and apply them to every copy).  Every document keeps its row
    (a fully-duplicated non-keeper document becomes empty text).  Documents with nothing to remove keep their ORIGINAL bytes;
    rewritten documents are re-joined with single spaces
    (whitespace-token-normalized — the same contract as the paper's
    token-level operation).

    ``min_count`` raises the removal bar (e.g. 10 → only spans
    occurring ten-plus times are cut — the 'memorization risk' setting).

    Shape note (measured on the 1M-turn corpus, BENCH.md r5): the
    naive groupBy-then-join-back form consumes the token-scale window
    table TWICE — either the fingerprint pass re-executes (143 s) or
    the table must be cached (81.6M deserialized rows GC-thrashed a
    16g JVM to 281 s).  The occurrence count and the min-(id,pos)
    keeper are instead computed as window aggregates over
    ``partitionBy(h1, h2)``: ONE shuffle, the window table streams
    through exactly once, nothing is cached.  ``reliable_checkpoint_dir``
    is accepted for API symmetry with the dedup family but unused in
    this single-pass form.

    Boundary slack: removal is the union of duplicated windows, so a
    duplicated span's first/last partial-window tokens (< ``width``)
    at the edges of a LONGER non-duplicated context are kept — the
    paper's suffix-array form has the same ±1-token edge convention.
    """
    from pyspark.sql import Window

    wins = window_fingerprints(df, text_col, id_col, width)
    w = Window.partitionBy("h1", "h2")
    remove = (
        wins.withColumn("_c", F.count("*").over(w))
        .withColumn("_k", F.min(F.struct("id", "pos")).over(w))
        .filter(
            (F.col("_c") >= min_count)
            & (
                (F.col("id") != F.col("_k.id"))
                | (F.col("pos") != F.col("_k.pos"))
            )
        )
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("_cut_pos"))
    )
    return _apply_cuts(df, remove, text_col, id_col, width)


def _apply_cuts(
    df: DataFrame, remove: DataFrame, text_col: str, id_col: str, width: int
) -> DataFrame:
    """Join per-doc sorted cut positions (``remove``: (id, _cut_pos))
    back to the corpus and rebuild affected documents: numpy interval
    marking (+1/-1 diff, cumsum>0 = covered token) drops covered
    tokens; untouched docs pass through with their original bytes."""
    joined = df.join(remove.withColumnRenamed("id", id_col), id_col, "left")

    out_fields = df.schema.fieldNames()
    out_schema = joined.drop("_cut_pos").schema.add("n_tokens_removed", "long")

    def _rebuild(batches):
        for b in batches:
            texts = []
            removed = []
            for t, cuts in zip(b[text_col], b["_cut_pos"]):
                if cuts is None or len(cuts) == 0:
                    texts.append(t)
                    removed.append(0)
                    continue
                toks = [w for w in _WS_SPLIT.split(t or "") if w]
                cover = np.zeros(len(toks) + 1, dtype=np.int32)
                starts = np.asarray(cuts, dtype=np.int64)
                ends = np.minimum(starts + width, len(toks))
                np.add.at(cover, starts, 1)
                np.add.at(cover, ends, -1)
                mask = np.cumsum(cover[:-1]) > 0
                kept = [w for w, m in zip(toks, mask) if not m]
                texts.append(" ".join(kept))
                removed.append(int(mask.sum()))
            out = b.drop(columns=["_cut_pos"])
            out[text_col] = texts
            out["n_tokens_removed"] = removed
            yield out

    return joined.mapInPandas(_rebuild, out_schema).select(
        *out_fields, "n_tokens_removed"
    )


def substring_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", width: int = 50
) -> DataFrame:
    """Aggregated fingerprint index ``(h1, h2, n_occ)`` of a KEPT
    corpus — the persistable state that makes substring dedup
    incremental (the ``kept_sigs`` pattern from ops/corpus.py applied
    here).  One token-scale pass, one partial-aggregated shuffle; the
    output is distinct-fingerprint-scale.  Store it partitioned/bucketed
    by (h1, h2) so batch probes shuffle only the batch side."""
    return (
        window_fingerprints(df, text_col, id_col, width)
        .groupBy("h1", "h2")
        .agg(F.count("*").alias("n_occ"))
    )


def dedup_substrings_incremental(
    index: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Incremental ``dedup_substrings``: clean only the NEW batch
    against the stored corpus' fingerprint index (``substring_index``)
    plus the batch itself — history is never re-tokenized.

    Removal rule per batch window: total occurrences (history count +
    batch count) ≥ ``min_count``, and the occurrence is removed unless
    it is the canonical keeper.  History always out-ranks the batch
    (the append contract: batch ids sort after every stored id, as in
    ``clean_corpus_incremental``), so any batch window whose
    fingerprint exists in the index is removed outright; a window new
    to the corpus keeps its min-(id,pos) batch occurrence.

    Equals the full recompute ``dedup_substrings(history ∪ batch)``
    under the append contract when the stored history text is itself
    the fixed point (nothing was cut from it — true for corpora that
    were clean on arrival, and asserted in tests); when history WAS cut
    in earlier rounds, the stored text is the canonical corpus and the
    batch is cleaned against it as-is — same "history is immutable"
    semantics as ``clean_corpus_incremental``.

    Plan: fingerprint the batch only; ONE window-aggregate shuffle over
    the batch windows; LEFT JOIN the (distinct-fingerprint-scale) index
    on (h1, h2) — with the index bucketed by (h1, h2) only the batch
    side shuffles; rebuild touches only affected batch docs."""
    from pyspark.sql import Window

    bwins = window_fingerprints(batch, text_col, id_col, width)
    w = Window.partitionBy("h1", "h2")
    probed = (
        bwins.withColumn("_bc", F.count("*").over(w))
        .withColumn("_k", F.min(F.struct("id", "pos")).over(w))
        .join(index.select("h1", "h2", "n_occ"), ["h1", "h2"], "left")
    )
    total = F.col("_bc") + F.coalesce(F.col("n_occ"), F.lit(0))
    in_history = F.col("n_occ").isNotNull()
    non_keeper = (F.col("id") != F.col("_k.id")) | (
        F.col("pos") != F.col("_k.pos")
    )
    remove = (
        probed.filter((total >= min_count) & (in_history | non_keeper))
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("_cut_pos"))
    )
    return _apply_cuts(batch, remove, text_col, id_col, width)


def update_substring_index(
    index: DataFrame,
    cleaned_batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 50,
) -> DataFrame:
    """New index = old index + the CLEANED batch's fingerprints
    (re-fingerprinting the cleaned text, not the raw batch — cut spans
    must not count as stored occurrences).  One token-scale pass over
    the batch only; merge is a fingerprint-keyed sum."""
    delta = substring_index(cleaned_batch, text_col, id_col, width)
    return (
        index.unionByName(delta)
        .groupBy("h1", "h2")
        .agg(F.sum("n_occ").alias("n_occ"))
    )
