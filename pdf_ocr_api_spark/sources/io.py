"""Iceberg-first table IO with parquet fallback (SURVEY §2.1 S2/S3/S9).

The engine targets Iceberg tables (`north_rule`); this sandbox has no
iceberg-spark-runtime jar, so every read/write goes through this thin
layer: when an Iceberg catalog is configured on the session the code path
is `spark.read/writeTo("catalog.db.table")`; otherwise the same logical
tables live as parquet directories. The rest of the engine never branches.

Production setup (documented for spark-submit deployments):
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hadoop|hive|rest
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured AND the runtime jar is
    on the classpath. Catalogs are looked up in the session's
    RuntimeConfig, not the SparkContext conf — catalogs registered at
    runtime via ``spark.conf.set("spark.sql.catalog.x", ...)`` (as the
    jar-gated test fixture does) never appear in the context conf."""
    try:
        confs = spark.conf.getAll  # pyspark >= 3.4 property
    except Exception:
        # older pyspark: fall back to the SparkContext conf rather than
        # silently reporting "no catalog" (catalogs set at launch via
        # --conf DO appear there)
        confs = dict(spark.sparkContext.getConf().getAll())
    has_catalog = any(k.startswith("spark.sql.catalog.") for k in confs)
    if not has_catalog:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


import re as _re

_IDENT_RX = _re.compile(r"^[A-Za-z_][\w]*(\.[A-Za-z_][\w]*){1,2}$")
_FILE_EXT = (".parquet", ".json", ".csv", ".orc", ".avro")


def is_table_ident(target: str) -> bool:
    """catalog.db.table identifiers vs filesystem paths.

    A bare single-segment name ("results") is treated as a PATH — Spark
    writes it as a relative directory and that is the common CLI usage;
    identifiers must be dotted (db.table or catalog.db.table) and not
    end in a data-file extension.
    """
    if "/" in target or target.startswith(("s3:", "hdfs:", "file:")):
        return False
    if target.lower().endswith(_FILE_EXT):
        return False
    return bool(_IDENT_RX.match(target))


def sub_target(root: str, name: str) -> str:
    """Derive a child table target under an output root: path roots get
    ``root/name`` (bare single-segment names are paths, matching
    ``is_table_ident``); catalog idents get ``root_name`` (suffixing the
    table name keeps it a valid ident)."""
    return f"{root}_{name}" if is_table_ident(root) else f"{root}/{name}"


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if is_table_ident(target):
        return spark.read.table(target)
    return spark.read.parquet(target)


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Append/overwrite a logical table.

    Iceberg path: `writeTo(...).append()` / `overwritePartitions()` —
    ACID, so concurrent/bucket-wise writes are safe. Parquet path:
    directory writes with dynamic partition overwrite for the
    `overwrite_partitions` mode (same idempotent-resume semantics).
    """
    if is_table_ident(target):
        # first write against a fresh root must CREATE the table:
        # append()/overwritePartitions() raise NoSuchTableException on a
        # missing table, and lineage.run's very first run would otherwise
        # crash on every new Iceberg output root
        if mode in ("append", "overwrite_partitions") and not df.sparkSession.catalog.tableExists(
            target
        ):
            mode = "create"
        w = df.writeTo(target)
        if mode == "append":
            w.append()
        elif mode == "overwrite_partitions":
            w.overwritePartitions()
        elif mode == "create":
            if partition_by:
                from pyspark.sql import functions as F  # noqa: N812

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            raise ValueError(mode)
        return

    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if mode == "overwrite_partitions":
        writer.option("partitionOverwriteMode", "dynamic").mode("overwrite").parquet(target)
    elif mode in ("append", "create"):
        writer.mode("append" if mode == "append" else "overwrite").parquet(target)
    else:
        raise ValueError(mode)


def table_exists(spark: SparkSession, target: str) -> bool:
    if is_table_ident(target):
        return spark.catalog.tableExists(target)
    from pathlib import Path

    p = Path(target)
    return p.exists() and any(p.rglob("*.parquet"))
