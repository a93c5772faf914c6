"""SparkSession factory tuned for the extraction workload.

Local mode here; the same knobs are what we'd ship to a 1000-executor
cluster: AQE on (runtime re-plan + skew-join splitting), Arrow batching
capped so a 400-page filing's span array doesn't blow an Arrow batch,
shuffle partitions sized to parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "samu_ocr_extraction_poc_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession; ``cores=None`` -> local[*].

    ``spark.sql.execution.arrow.maxRecordsPerBatch`` is deliberately low:
    each record carries a whole document's span array, so batches are sized
    by document count, not rows (skew discipline, SURVEY.md §4).
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    shuffle = shuffle_partitions or (cores * 2 if cores else 32)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate turns every explode(expensive_array_expr)
        # into an inferred `size(expr) > 0` filter that Catalyst then pushes
        # BELOW the repartition exchange — the whole shingle/window/k-gram
        # array (md5 per element) is evaluated once in the low-parallelism
        # scan stage just to be discarded, then recomputed above the
        # exchange (measured: the filter stage alone was 1.1 s of the 3.0 s
        # remove_shared_windows wall at sf0.1; excluding the rule took the
        # query to 1.65 s with bit-identical results). Scale-independent:
        # the doubled evaluation + filter-below-exchange placement is wrong
        # at any cluster size for generator inputs that are never empty by
        # construction (every explode in this engine guards emptiness
        # explicitly). Results are unaffected — the rule only ever inserts
        # redundant filters.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
