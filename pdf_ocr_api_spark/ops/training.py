"""Training-set assembly: leakage-safe splits, mixture weighting,
deterministic shuffle, and sequence packing.

The last mile of the training-data product: after cleaning
(``ops/corpus``), dedup (``ops/dedup``) and benchmark decontamination
(``ops/decontam``), a corpus still has to be *assembled* into a training
set — split into train/val/test without leakage, re-weighted to a target
domain mixture, shuffled reproducibly, and packed into fixed
token-budget sequences. The reference engine has no analogue (it is a
document-extraction service); these operators belong to the
training-data-pipeline axis the engine serves.

Design rules, Spark-first and 100 TB-first:

* **Every decision is a pure function of (key, salt)** — a 60-bit hash
  derived from ``md5``, computable identically in Spark
  (``conv(substr(md5(x),1,15),16,10)``) and in plain SQL engines
  (DuckDB: ``('0x'||substr(md5(x),1,15))::BIGINT``). No RNG state, no
  driver coordination: split/sample/shuffle are map-side projections
  that shuffle NOTHING, and an incremental batch lands in the same
  split/sample its rows would have landed in during a full rebuild —
  the property that makes grow-only corpora (``clean_corpus_incremental``)
  composable with training-set assembly.
* **Mixture weights are monotone**: raising a domain's weight only ADDs
  rows (keep-if ``h < w·2^60``), so mixture iteration never invalidates
  previously-materialized samples.
* **Packing is bucket-local**: one hash shuffle into ``n_buckets``
  groups, then a vectorized per-bucket boundary walk (numpy
  ``searchsorted`` per PACK, not per row). Packs never span buckets, so
  there is no global sequential dependency — parallelism is chosen by
  bucket count, not dictated by corpus order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS

# \x1f (unit separator) keeps (key='a', salt='b') distinct from
# (key='ab', salt='') without being typable in normal corpus keys
_SEP = "\x1f"


def portable_hash(col, salt: str = ""):
    """Uniform int64 in ``[0, 2^60)`` from ``md5(key <US> salt)``.

    Engine-portable by construction: DuckDB's
    ``('0x' || substr(md5(key || chr(31) || salt), 1, 15))::BIGINT``
    produces the identical value (asserted cross-engine in tests), so
    split/sample assignments can be audited or recomputed outside Spark.
    NULL keys hash like the empty string (``concat_ws`` drops them):
    all-null keys land together — key choice is the caller's contract.
    """
    return (
        F.conv(F.substring(F.md5(F.concat_ws(_SEP, col.cast("string"), F.lit(salt))), 1, 15), 16, 10)
        .cast("bigint")
    )


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """Normalized cumulative hash thresholds for ``assign_splits`` —
    exposed so tests/audits can rebuild the exact decision boundaries."""
    names = list(weights)
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    out, cum = [], 0.0
    for name in names:
        cum += weights[name] / total
        out.append((name, min(HASH_SPACE, int(cum * HASH_SPACE))))
    out[-1] = (out[-1][0], HASH_SPACE)  # close float gap: last bin owns the tail
    return out


def assign_splits(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "conv_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: ``split = f(key, salt)``.

    Keying on the GROUP identity (conversation, document, source URL —
    not the row) is what prevents leakage: every turn of a conversation
    lands in the same split, on this run, on every rerun, and on every
    future incremental batch. A pure projection — no shuffle, no
    sampling state, codegen-friendly — and the boundaries are plain
    integer thresholds on the portable hash, so the assignment is
    reproducible in any engine with md5.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    bounds = split_thresholds(weights)
    # stage the hash as a column FIRST — a when-chain over the raw md5
    # expr would inline it once per branch (expression-CSE pitfall)
    staged = df.withColumn("_h_split", portable_hash(F.col(key_col), salt))
    expr = F.lit(bounds[-1][0])
    for name, upper in reversed(bounds[:-1]):
        expr = F.when(F.col("_h_split") < F.lit(upper), F.lit(name)).otherwise(expr)
    return staged.withColumn(out_col, expr).drop("_h_split")


def mixture_weights_plan(
    fractions: dict[str, float], default: float = 1.0
) -> list[tuple[str, int, int]]:
    """Per-domain (value, whole_copies, remainder_threshold) plan for
    ``mixture_sample``. A weight of 2.3 means: 2 deterministic copies of
    every row, plus a 3rd copy for rows with ``h < 0.3·2^60``."""
    plan = []
    for value, w in fractions.items():
        if w < 0:
            raise ValueError(f"mixture weight for {value!r} must be >= 0")
        whole = int(w)
        rem = min(HASH_SPACE, int(round((w - whole) * HASH_SPACE)))
        plan.append((value, whole, rem))
    if default < 0:
        raise ValueError("default mixture weight must be >= 0")
    return plan


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    domain_col: str,
    key_col: str,
    salt: str = "",
    default: float = 1.0,
    copy_col: str = "mix_copy",
) -> DataFrame:
    """Deterministic domain re-weighting — the training-mixture operator.

    ``fractions`` maps domain values to target weights. Weights in
    ``[0, 1]`` DOWN-sample (keep iff ``h < w·2^60``); weights above 1
    UP-sample by deterministic replication (``floor(w)`` copies plus one
    more on the hash remainder — "2.3 epochs of code, 0.5 of web").
    Unlisted domains get ``default`` (1.0 = pass through).

    Properties a pipeline operator actually relies on, all tested:
    *monotone* (raising a weight only adds rows — existing samples stay
    valid), *stable* (same key+salt → same decision on every run and
    every incremental batch), *shuffle-free* (projection + ``explode`` of
    a tiny int sequence; no sampling state anywhere). Output rows carry
    ``copy_col`` (0-based copy index) so downstream shuffle/packing can
    scatter replicas: hash on ``(key, copy)`` — replicas of a row land in
    different packs, not adjacent ones.
    """
    plan = mixture_weights_plan(fractions, default)
    h = portable_hash(F.col(key_col), salt)

    d = F.col(domain_col).cast("string")
    whole = F.lit(int(default))
    rem = F.lit(min(HASH_SPACE, int(round((default - int(default)) * HASH_SPACE))))
    for value, w_whole, w_rem in reversed(plan):
        whole = F.when(d == F.lit(value), F.lit(w_whole)).otherwise(whole)
        rem = F.when(d == F.lit(value), F.lit(w_rem)).otherwise(rem)

    out = (
        df.withColumn("_h_mix", h)
        .withColumn("_copies", whole + (F.col("_h_mix") < rem).cast("int"))
        .filter(F.col("_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)))
        .drop("_h_mix", "_copies")
    )
    return out


def deterministic_shuffle(
    df: DataFrame,
    key_cols: list[str],
    salt: str = "",
    out_col: str = "shuffle_key",
    partitions: int | None = None,
) -> DataFrame:
    """Reproducible global shuffle: order by ``hash(key-tuple, salt)``.

    Different salts give independent epoch orders over the same corpus
    with zero stored state. ``repartitionByRange`` on the hash gives a
    globally-shuffled LAYOUT (range exchange — the one shuffle here);
    within-partition sort finishes the total order. At 100 TB this is
    how you shuffle: no driver-side permutation, no random() (which
    breaks task retries — a re-executed task must re-draw identical
    values, and ``rand()`` only guarantees that per partition-id, not
    across AQE re-plans)."""
    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    out = df.withColumn(out_col, portable_hash(key, salt))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # key-tuple tie-break: a 60-bit hash collides eventually at corpus
    # scale, and a tie must not leave the order partition-dependent
    return out.repartitionByRange(n, out_col).sortWithinPartitions(out_col, *key_cols)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

# pack_id = bucket << _PACK_SHIFT | bucket-local index: globally unique
# without any cross-bucket coordination (supports 2^24 buckets × 2^40
# packs per bucket)
_PACK_SHIFT = 40


def greedy_pack_bounds(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Sequential greedy packing over an ORDERED token-count vector:
    returns the exclusive end index of each pack. Vectorized per pack —
    each iteration closes one pack with a ``searchsorted`` on the running
    cumsum — so the Python loop count is #packs (≈ n·avg_tokens/budget),
    not #rows. A single row over budget gets a pack of its own (the
    caller decides whether to truncate or drop oversize rows; packing
    itself never loses data)."""
    c = np.cumsum(tokens, dtype=np.int64)
    n = len(tokens)
    bounds = []
    start = 0
    while start < n:
        base = c[start - 1] if start else 0
        end = int(np.searchsorted(c, base + budget, side="right"))
        if end <= start:  # oversize single row
            end = start + 1
        bounds.append(end)
        start = end
    return np.asarray(bounds, dtype=np.int64)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_cols: list[str],
    salt: str = "",
    n_buckets: int | None = None,
    strategy: str = "sequential",
) -> DataFrame:
    """Pack rows into fixed token-budget sequences (training batches).

    Rows are hash-scattered into ``n_buckets`` buckets (one shuffle —
    the only one in the pass), deterministically ordered within each
    bucket by the same hash, and greedily packed: a pack closes when the
    next row would exceed ``budget``. Output adds ``pack_id`` (globally
    unique bigint, bucket-local counter under a bucket prefix — no
    cross-bucket coordination), ``pack_pos`` (0-based position within
    the pack) and ``pack_tokens`` (the pack's total, repeated on each
    member — oversize singles are exactly the rows with
    ``pack_tokens > budget``, detectable without a second pass).

    ``strategy``: ``"sequential"`` packs in hash order (the shuffled
    order training wants); ``"nfd"`` sorts each bucket by descending
    token count first (next-fit-decreasing — tighter packs, ≤ the
    sequential pack count, asserted in tests) at the cost of losing the
    shuffled order. Both are deterministic and partition-invariant: the
    bucket assignment and in-bucket order depend only on (key, salt).

    Scale: per-bucket state is one pandas frame of ``rows/n_buckets``
    rows; pick ``n_buckets`` so that fits comfortably (default:
    ``defaultParallelism`` — pandas-UDF stages want one wave of
    core-sized tasks, not 4×). Null/negative token counts are treated
    as 0 (they pack, they just don't count against the budget).
    """
    if strategy not in ("sequential", "nfd"):
        raise ValueError(f"unknown packing strategy: {strategy!r}")
    if budget <= 0:
        raise ValueError("budget must be > 0")
    spark = df.sparkSession
    n_buckets = n_buckets or spark.sparkContext.defaultParallelism
    if n_buckets < 1 or n_buckets > (1 << (63 - _PACK_SHIFT)):
        raise ValueError("n_buckets out of range")

    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    staged = (
        df.withColumn("_pk_key", key)
        .withColumn("_pk_hash", portable_hash(F.col("_pk_key"), salt))
        .withColumn("_pk_bucket", F.pmod("_pk_hash", F.lit(n_buckets)).cast("int"))
        .withColumn("_pk_tok", F.greatest(F.coalesce(F.col(token_col).cast("long"), F.lit(0)), F.lit(0)))
    )

    out_schema = T.StructType(
        staged.schema.fields
        + [
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_pos", T.IntegerType()),
            T.StructField("pack_tokens", T.LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["_pk_bucket"].iloc[0])
        # key-string tie-break behind the hash: partition-invariant order
        # even on (rare at bucket scale, certain at corpus scale) hash ties
        keys = pdf["_pk_key"].to_numpy()
        if strategy == "nfd":
            order = np.lexsort((keys, pdf["_pk_hash"].to_numpy(), -pdf["_pk_tok"].to_numpy()))
        else:
            order = np.lexsort((keys, pdf["_pk_hash"].to_numpy()))
        pdf = pdf.iloc[order].reset_index(drop=True)
        tok = pdf["_pk_tok"].to_numpy(dtype=np.int64)
        bounds = greedy_pack_bounds(tok, budget)
        starts = np.concatenate(([0], bounds[:-1]))
        sizes = bounds - starts
        local = np.repeat(np.arange(len(bounds), dtype=np.int64), sizes)
        csum = np.cumsum(tok, dtype=np.int64)
        totals = csum[bounds - 1] - np.concatenate(([0], csum[bounds[:-1] - 1]))
        pdf["pack_id"] = (np.int64(bucket) << _PACK_SHIFT) | local
        pdf["pack_pos"] = (np.arange(len(pdf), dtype=np.int64) - np.repeat(starts, sizes)).astype(np.int32)
        pdf["pack_tokens"] = np.repeat(totals, sizes)
        return pdf

    packed = staged.groupBy("_pk_bucket").applyInPandas(_pack, schema=out_schema)
    return packed.drop("_pk_key", "_pk_hash", "_pk_bucket", "_pk_tok")


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_cols: list[str],
    salt: str = "",
    token_col: str | None = None,
) -> DataFrame:
    """The assembly's last mile: deterministic hash-sharded output files
    plus a manifest — what a trainer's data loader actually consumes.

    Every row lands in ``shard = hash(key, salt) % n_shards`` — a pure
    function of the row's key, so the same corpus produces byte-stable
    shard membership under any partitioning, and an incremental rebuild
    moves no rows between shards that it didn't change. Rows are
    colocated per shard (``repartition(n_shards, shard)`` — the one
    shuffle) and sorted within the file by (hash, key) so the file
    order is the epoch-shuffle order, then written as
    ``path/shard=NNNNN/`` parquet directories (one file per shard:
    hash-colocation puts each shard's rows in a single task).

    Returns the manifest (also written to ``path/_manifest``): one row
    per shard with row count, token sum (when ``token_col`` given) and
    the key-hash span — the sidecar a loader uses to size epochs and an
    auditor uses to detect a short-written shard without re-scanning
    data. Balance note: hash sharding is balanced to ~1/sqrt(rows per
    shard); pick ``n_shards`` so shards hold thousands of rows, not
    tens.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    staged = (
        df.withColumn("_sh_hash", portable_hash(key, salt))
        .withColumn("shard", F.pmod("_sh_hash", F.lit(n_shards)).cast("int"))
    )
    (
        staged.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_sh_hash", *key_cols)
        .drop("_sh_hash")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    # manifest from the WRITTEN files, not the input plan: re-running the
    # upstream pipeline just to count would double the job; a columnar
    # re-read of (keys, token_col) over fresh parquet is ~free, and it
    # audits what actually landed on disk
    spark = df.sparkSession
    written = spark.read.parquet(path)
    wkey = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_sh_hash").alias("min_hash"),
        F.max("_sh_hash").alias("max_hash"),
    ]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col).cast("long")).alias("n_tokens"))
    manifest = (
        written.withColumn("_sh_hash", portable_hash(wkey, salt))
        .groupBy("shard")
        .agg(*aggs)
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def validate_shards(spark, path: str) -> DataFrame:
    """Audit written shards against their manifest: re-count each
    ``shard=`` directory and return rows where counts disagree (empty
    frame = healthy). The cheap post-write integrity gate for a job
    that must not hand a trainer a short shard."""
    actual = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    manifest = spark.read.parquet(f"{path}/_manifest")
    return (
        manifest.join(actual, "shard", "full_outer")
        .filter(
            F.coalesce(F.col("n_rows"), F.lit(-1)) != F.coalesce(F.col("actual_rows"), F.lit(-1))
        )
        .select("shard", "n_rows", "actual_rows")
    )


def split_leakage_pairs(
    df: DataFrame,
    split_col: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-split near-duplicate audit — the leakage check a hash split
    cannot give you by construction.

    ``assign_splits`` guarantees a GROUP never straddles splits, but two
    *different* groups carrying near-identical text still can (mirrored
    articles, re-posted code, template families) — and a test-set row
    whose near-twin sits in train is benchmark leakage. This composes the
    dedup stack (``dedup.minhash_lsh_pairs`` → ``dedup.jaccard_verify``,
    same knobs, same skew cap) with the split column and keeps only the
    verified pairs whose endpoints disagree on split:
    ``(id_a, split_a, id_b, split_b, jaccard)``.

    Exact duplicates are near-duplicates (jaccard 1.0), so this subsumes
    an exact cross-split check — except for texts shorter than ``k``
    words, whose shingle set is empty and which no n-gram method can
    compare (run the corpus min-token gate first). Cost profile is the
    dedup pass itself; the split bookkeeping adds two broadcast-sized
    semi-join projections, no extra shuffle over the verify step.
    """
    from . import dedup

    pairs = dedup.minhash_lsh_pairs(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        bands=bands, k=k, max_bucket_size=max_bucket_size,
    )
    verified = dedup.jaccard_verify(
        df, pairs, text_col=text_col, id_col=id_col, k=k, threshold=threshold
    )
    splits = df.select(F.col(id_col).alias("_sl_id"), F.col(split_col).alias("_sl_split"))
    out = (
        verified.join(splits, verified["id_a"] == splits["_sl_id"])
        .withColumnRenamed("_sl_split", "split_a")
        .drop("_sl_id")
        .join(splits, verified["id_b"] == splits["_sl_id"])
        .withColumnRenamed("_sl_split", "split_b")
        .drop("_sl_id")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "split_a", "id_b", "split_b", "jaccard")
    )
    # ride the dedup pass' recall-loss accounting through to the caller
    for attr in ("_bucket_cap_observation", "_bucket_cap_fallback"):
        if getattr(pairs, attr, None) is not None:
            setattr(out, attr, getattr(pairs, attr))
    return out


def split_leakage_report(leak_pairs: DataFrame) -> DataFrame:
    """Aggregate ``split_leakage_pairs`` into the frame an operator
    alerts on: one row per (split_a, split_b) direction with the pair
    count, distinct contaminated ids on each side, and the worst
    example. Empty frame = no detectable leakage at the threshold."""
    return (
        leak_pairs.groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("id_a").alias("n_ids_a"),
            F.countDistinct("id_b").alias("n_ids_b"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
            F.max_by(F.struct("id_a", "id_b"), F.col("jaccard")).alias("_worst"),
        )
        .select(
            "split_a", "split_b", "n_pairs", "n_ids_a", "n_ids_b", "max_jaccard",
            F.col("_worst.id_a").alias("worst_id_a"),
            F.col("_worst.id_b").alias("worst_id_b"),
        )
        .orderBy("split_a", "split_b")
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row utilization summary of a packed frame: pack counts,
    oversize count, and mean fill fraction — the number a pipeline
    monitors (fill « 1 means the budget or bucket sizing is wrong)."""
    per_pack = packed.groupBy("pack_id").agg(
        F.first("pack_tokens").alias("tokens"), F.count(F.lit(1)).alias("rows")
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("rows").alias("n_rows"),
        F.sum((F.col("tokens") > budget).cast("int")).alias("n_oversize"),
        F.round(F.avg(F.least(F.col("tokens"), F.lit(budget)) / F.lit(float(budget))), 6).alias(
            "mean_fill"
        ),
    )
