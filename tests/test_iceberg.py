"""Iceberg-path integration tests (SURVEY §2.1 S9, north-rule sink).

This sandbox ships no iceberg-spark-runtime jar, so these tests GATE on
jar presence and skip cleanly here — they exist so that any environment
with the jar (the production spark-submit setup documented in
sources/io.py:9-13) exercises the real `writeTo().append()` /
`overwritePartitions()` code paths, whose resume semantics are otherwise
proven only through the parquet dynamic-partition-overwrite fallback
(tests/test_resume.py).
"""

import glob
import os

import pytest


def _iceberg_jar_present() -> bool:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    if glob.glob(os.path.join(jars, "iceberg-spark-runtime*")):
        return True
    extra = os.environ.get("SPARK_GRAFT_ICEBERG_JAR", "")
    return bool(extra and os.path.exists(extra))


requires_iceberg = pytest.mark.skipif(
    not _iceberg_jar_present(), reason="iceberg-spark-runtime jar not on the classpath"
)


@pytest.fixture()
def iceberg_catalog(spark, tmp_path):
    """Configure a hadoop-type Iceberg catalog at a tmp warehouse.

    Catalog confs are resolved lazily, so runtime `spark.conf.set` works
    on the shared session; the JAR itself must already be on the JVM
    classpath (hence the module gate)."""
    spark.conf.set("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "warehouse"))
    yield "it"


@requires_iceberg
def test_write_append_and_overwrite_partitions(spark, iceberg_catalog):
    from pyspark.sql import functions as F

    from pdf_ocr_api_spark.sources import io

    tbl = "it.db.t_parts"
    df = spark.range(0, 100).withColumn("bucket", (F.col("id") % 4).cast("int"))
    io.write_table(df, tbl, mode="create", partition_by=["bucket"])
    assert io.table_exists(spark, tbl)
    assert io.read_table(spark, tbl).count() == 100

    # dynamic partition overwrite: rewriting bucket 1 must not touch others
    repl = (
        spark.range(1000, 1010)
        .withColumn("bucket", F.lit(1).cast("int"))
    )
    io.write_table(repl, tbl, mode="overwrite_partitions")
    out = io.read_table(spark, tbl)
    assert out.filter("bucket = 1").count() == 10
    assert out.filter("bucket != 1").count() == 75  # 3 × 25 untouched


@requires_iceberg
def test_lineage_resume_on_iceberg(spark, iceberg_catalog, depara):
    """Full checkpointed-run resume over Iceberg tables: run, wipe one
    bucket's manifest row path (simulated crash = partial manifest),
    re-run → only pending buckets reprocess and the data converges."""
    from pdf_ocr_api_spark import fixtures, lineage

    sdf = spark.createDataFrame(fixtures.fixture_frame(12))
    root = "it.db.r1"
    r1 = lineage.run(spark, sdf, root, run_id="a", n_buckets=4, depara=depara)
    assert sorted(r1["buckets_processed"]) == [0, 1, 2, 3]

    # resume with everything done → nothing reprocessed, data unchanged
    n_before = lineage.read_output(spark, root).count()
    r2 = lineage.run(spark, sdf, root, run_id="b", n_buckets=4, depara=depara)
    assert r2["buckets_processed"] == []
    assert sorted(r2["buckets_skipped"]) == [0, 1, 2, 3]
    assert lineage.read_output(spark, root).count() == n_before
