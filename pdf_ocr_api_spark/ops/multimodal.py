"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition sizing,
Arrow batch shape, UDF signatures — is real and tested; the actual codec
work is STUBBED (no image/audio libraries in this container):

* ``decode_image`` raises ``NotImplementedError`` (clearly marked stub);
* ``fake_features`` is the deterministic stand-in used by tests — a
  seeded hash-derived vector, so the distributed plumbing can be verified
  byte-for-byte without a codec.

At 100 TB the binary column dominates IO: keep media in its own table
(or Iceberg file-split-friendly column ordering), size Arrow batches by
bytes not rows (`spark.sql.execution.arrow.maxRecordsPerBatch` low), and
never collect the payload — only derived features leave the executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, payload BINARY, "
    "meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: INT>"
)

FEATURE_SCHEMA = "media_id BIGINT, kind STRING, n_bytes BIGINT, feature ARRAY<FLOAT>"

FEATURE_DIM = 16


def decode_image(payload: bytes):
    """STUB: real image decode requires a codec library (PIL/libvips),
    not available in this container. The Spark plumbing calls
    ``fake_features`` instead; swap this in when a codec is present."""
    raise NotImplementedError("image decode stub — no codec library in this environment")


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256-seeded vector.
    Same bytes → same vector on every executor (test contract)."""
    if payload is None:
        payload = b""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big", signed=False) % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary payload column → feature vectors.

    The per-element loop is over *media objects* (one payload = one
    document), with the numeric work vectorizable inside the extractor —
    the same batch shape a real decoder (decode → resize → embed) uses.
    """
    for pdf in batches:
        feats = [fake_features(p).tolist() for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                "feature": feats,
            }
        )


def media_features(df):
    """binary media table → feature table (mapInPandas, shuffle-free)."""
    return df.mapInPandas(extract_features_udf, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64):
    """Deterministic fake media table for tests/benchmarks (payload =
    seeded bytes; kinds cycle image/audio/video)."""
    from pyspark.sql import functions as F  # noqa: N812

    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("id") * 100).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return df


def resize_image(payload: bytes, width: int, height: int):
    """STUB: image resize needs a codec (PIL/libvips) — absent here."""
    raise NotImplementedError("image resize stub — no codec library in this environment")


def fake_resized_bytes(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: size-tagged digest of the source
    bytes (same contract shape a real resize has: bytes → bytes)."""
    tag = f"resized-{width}x{height}-".encode()
    return tag + hashlib.sha256(payload or b"").digest()


RESIZE_SCHEMA = "media_id BIGINT, width INT, height INT, payload BINARY"


def resize_media(df, width: int = 64, height: int = 64):
    """binary media → resized binary (mapInPandas; deterministic fake)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [fake_resized_bytes(p, width, height) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(fn, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, frame ARRAY<FLOAT>"


def frame_sample(df, n_frames: int = 4):
    """Video frame sampling plumbing: one media row → n_frames feature
    rows (the UDTF row-expansion shape a real decoder uses; frames are
    deterministic fakes seeded by (payload, frame_idx))."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fake_features((payload or b"") + i.to_bytes(2, "big")).tolist())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(fn, schema=FRAME_SCHEMA)
