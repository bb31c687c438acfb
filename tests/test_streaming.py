"""Structured Streaming ingest: micro-batch extraction == batch bytes."""

import pytest
from pyspark.sql import functions as F

from pdf_ocr_api_spark import fixtures, pipeline
from pdf_ocr_api_spark.streaming import stream as S


def test_stream_drain_matches_batch(spark, depara, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pdf = fixtures.fixture_frame(10)
    sdf = spark.createDataFrame(pdf).withColumn("turn_idx", F.col("turn_idx").cast("int"))
    sdf.repartition(4).write.parquet(src)

    q = S.start_extraction_stream(spark, src, out, ckpt, depara, available_now=True)
    q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "kind", "clean_text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = (
        pipeline.extract_transcripts(spark.read.parquet(src), depara)
        .select("conv_id", "turn_idx", "kind", "clean_text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert got.equals(want)
    assert len(got) == len(pdf)


def test_stream_resume_is_exactly_once(spark, depara, tmp_path):
    """Second drain with the same checkpoint must add no rows; new files
    are picked up incrementally."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(fixtures.fixture_frame(5)).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.parquet(str(src))
    q = S.start_extraction_stream(spark, str(src), out, ckpt, depara, available_now=True)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # drain again — no new input, no new rows
    q = S.start_extraction_stream(spark, str(src), out, ckpt, depara, available_now=True)
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1

    # add files → only the delta is processed
    extra = fixtures.fixture_frame(8)
    extra = extra[extra.conv_id > "conv-000004"]
    spark.createDataFrame(extra).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.mode("append").parquet(str(src))
    q = S.start_extraction_stream(spark, str(src), out, ckpt, depara, available_now=True)
    q.awaitTermination(300)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1 + len(extra)
