"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: dot product via
  ``aggregate(zip_with(...))`` (pure JVM expression, codegen'd), one
  orderBy+limit (Spark plans TakeOrderedAndProject — no full sort).
* LSH-bucketed ANN — the 100 TB path: signed-random-projection signatures
  computed from driver-seeded hyperplanes (literal arrays broadcast into
  the plan), bucket equality prunes the candidate set before the exact
  cosine rerank; multiprobe = flip each signature bit once.

At scale the brute force is a full scan per query (fine for batch scoring
of a handful of queries); the LSH variant turns it into a hash-partition
lookup. An IVF variant would replace the hyperplanes with k-means
centroids — same plan shape (bucket join + rerank).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_to(query_vec: list[float], col):
    """Cosine similarity of an array<float> column to a literal query."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    return _dot(col.cast("array<double>"), q) / (_norm(col.cast("array<double>")) * F.lit(qn))


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (ascending id tie-break for determinism)."""
    return (
        emb.select(
            F.col(id_col).alias("id"),
            F.round(cosine_to(query_vec, F.col(vec_col)), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def srp_signature(col, planes: list[list[float]]):
    """Signed-random-projection bucket id (int, one bit per plane)."""
    sig = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(col.cast("array<double>"), plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + F.shiftleft(bit, i)
    return sig


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: SRP bucket match (+1-bit multiprobe),
    exact rerank inside the candidate set."""
    planes = random_hyperplanes(len(query_vec), n_planes, seed)
    # query signature computed driver-side
    qsig = 0
    for i, p in enumerate(planes):
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        qsig |= (1 if dot >= 0 else 0) << i
    probes = [qsig] + ([qsig ^ (1 << i) for i in range(n_planes)] if multiprobe else [])

    sig = emb.withColumn("_sig", srp_signature(F.col(vec_col), planes))
    cand = sig.filter(F.col("_sig").isin(probes))
    return brute_force_topk(cand, query_vec, k, id_col=id_col, vec_col=vec_col)
