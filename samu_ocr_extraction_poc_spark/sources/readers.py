"""Sources/sinks: Iceberg-first with plain-parquet fallback (SURVEY.md §7).

The north_rule targets Iceberg tables; the sandbox has no Iceberg jars, so
every loader tries the Iceberg catalog and falls back to parquet paths with
identical schemas. Writers expose the bucketing/partitioning discipline the
100 TB plan needs (hash-bucket by doc_id so downstream joins co-locate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import DOCUMENTS_SCHEMA


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


def load_documents(spark: SparkSession, location: str) -> DataFrame:
    """Load the interleaved corpus from an Iceberg table name or a parquet
    path (schema enforced either way)."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(location)


def write_documents(
    df: DataFrame,
    location: str,
    n_buckets: int = 32,
    table_name: str | None = None,
) -> None:
    """Write the corpus bucketed by doc_id.

    - Iceberg present: ``writeTo(...).partitionedBy(bucket(n, doc_id))`` —
      real bucket transform, scan-time pruning + storage-partitioned joins.
    - Parquet fallback: directory partitioned by a bucket column computed
      with the same hash, which later reads can use for partition pruning
      and co-located processing.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if table_name and iceberg_available(spark):
        df.writeTo(table_name).partitionedBy(F.bucket(n_buckets, F.col("doc_id"))).createOrReplace()
        return
    (
        df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))
        .repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(location)
    )


def exclude_manifest_files(df: DataFrame) -> DataFrame:
    """F11 manifest-key filter: the reference's S3 prefix scans drop keys
    containing 'Manifest' (stack.ICD10CodeSaver.ts:42-46 and twins); the
    scan analog filters on the provenance file name — Catalyst evaluates
    input_file_name() without reading excluded rows' payloads."""
    from pyspark.sql import functions as F

    return df.where(~F.input_file_name().contains("Manifest"))


def read_text_corpus(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Generic text-corpus reader (S1/S2 analog: scans replace per-object
    GETs; key filters become partition/file pruning)."""
    reader = spark.read
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return reader.option("header", True).csv(path)
    if fmt == "text":
        return reader.text(path)
    raise ValueError(f"unsupported format: {fmt}")
