"""Iceberg table source — the north-rule input format, gated on the runtime
having the Iceberg Spark extension on its classpath (this sandbox image does
not ship the jars; BASELINE.md notes the parquet fallback).

On a production cluster:

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hive \\
      ...

then ``read_corpus(spark, "lake.db.source_files")`` serves the
(repo, path, commit, lang, content) table with Iceberg's snapshot isolation,
partition pruning and metadata-level file skipping feeding the same
Catalyst pushdown paths our postings/doc scans already rely on
(tests/test_plans.py asserts them against parquet, which shares the
DataSource V2 scan machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_corpus(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Read the source-code corpus from an Iceberg table name (if the
    runtime has Iceberg) or a parquet path (fallback, same schema)."""
    if "/" not in table_or_path and iceberg_available(spark):
        return spark.read.format("iceberg").load(table_or_path)
    return spark.read.parquet(table_or_path)


def write_snapshot(df: DataFrame, table_or_path: str, mode: str = "overwrite") -> None:
    """Write a table as an Iceberg snapshot when available, else parquet.
    mode='append' adds a snapshot to an existing table (incremental ingest);
    anything else replaces the table."""
    spark = df.sparkSession
    if "/" not in table_or_path and iceberg_available(spark):
        if mode == "append":
            df.writeTo(table_or_path).append()
        else:
            df.writeTo(table_or_path).createOrReplace()
        return
    df.write.mode(mode).parquet(table_or_path)
