"""Binary-document source (SURVEY §2.1 S2).

The reference downloads PDFs over HTTP into a Buffer
(ref worker/processJob.js:59-62); the Spark-native equivalent for
document corpora on a filesystem/object store is the ``binaryFile``
source: path, modificationTime, length and the payload bytes, with
pushdown on the path glob and ``spark.sql.files.maxPartitionBytes``
controlling split packing (one task never gets two multi-GB PDFs).

``sniff_kind`` classifies payloads by magic bytes — the binary twin of
the text-payload sniffer in pipeline.classify_batch — and the result
feeds the multimodal plumbing (ops/multimodal.media_features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = [
    ("pdf", b"%PDF"),
    ("png", b"\x89PNG"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("zip", b"PK\x03\x04"),
    # the pure-numpy-decodable formats (ops/codecs.py) — RIFF is sniffed
    # as 'riff' here (WAV vs AVI needs bytes 8-12; ops.codecs.sniff_codec
    # does the full check Python-side where the payload is in hand).
    # 'BM' alone is a 2-byte prefix (1/65536 of random payloads, any text
    # starting "BM…"), so the bmp entry is validated separately below:
    # byte 14 must be a known BITMAPINFOHEADER size (40/108/124).
    ("riff", b"RIFF"),
    ("y4m", b"YUV4MPEG2"),
    ("au", b".snd"),
]
# P6 PPM: 2-byte magic must be followed by Netpbm whitespace/comment —
# validated like bmp below rather than as a bare prefix
_PPM_NEXT = ["20", "09", "0D", "0A", "23"]


def _is_bmp(payload_col):
    return (F.hex(payload_col.substr(1, 2)) == "424D") & F.hex(
        payload_col.substr(15, 1)
    ).isin("28", "6C", "7C")


def read_binary_docs(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → (doc_path, mod_time, n_bytes, payload)."""
    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select(
            F.col("path").alias("doc_path"),
            F.col("modificationTime").alias("mod_time"),
            F.col("length").alias("n_bytes"),
            F.col("content").alias("payload"),
        )
    )


def _is_ppm(payload_col):
    return (F.hex(payload_col.substr(1, 2)) == "5036") & F.hex(
        payload_col.substr(3, 1)
    ).isin(*_PPM_NEXT)


def sniff_kind(payload_col):
    """Magic-byte payload classifier (expression — runs in codegen).
    Binary columns have no startswith; compare the hex of the prefix."""
    expr = F.when(_is_bmp(payload_col), F.lit("bmp")).otherwise(
        F.when(_is_ppm(payload_col), F.lit("ppm")).otherwise(F.lit("unknown"))
    )
    for kind, magic in reversed(_MAGIC):
        prefix_hex = F.hex(payload_col.substr(1, len(magic)))
        expr = F.when(prefix_hex == magic.hex().upper(), kind).otherwise(expr)
    return expr


def as_media_table(docs: DataFrame) -> DataFrame:
    """Shape a binaryFile scan into the multimodal media schema
    (ops/multimodal.MEDIA_SCHEMA) — media_id is a stable hash of the
    path so reruns are idempotent."""
    return docs.select(
        F.xxhash64("doc_path").alias("media_id"),
        sniff_kind(F.col("payload")).alias("kind"),
        F.col("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
