"""Single-pass data-quality profiling (the Deequ/Great-Expectations table
audit, relationally): per-column row/null/distinct counts plus min/max —
the gate a 100 TB ingest runs BEFORE any downstream operator trusts the
data (schema drift, null storms, cardinality collapse all surface here).

Shape argument: the naive formulation is one ``count(distinct col)`` per
column — k separate shuffles, or one agg with k distincts which Spark
compiles to an EXPAND (k×N rows) feeding a SINGLE aggregation whose
distinct pass is not partial-aggregable per column. This operator longs
the table once into (col_name, value) pairs and aggregates twice:

1. groupBy (col_name, value) — HIGH-cardinality keys, fully
   partial-aggregable (a column's duplicate values collapse map-side, so
   low-cardinality columns — exactly the ones that would skew — cost one
   combiner row per distinct value);
2. groupBy col_name over at most Σ distinct-counts rows — tiny.

Every statistic is exact (the oracle is plain SQL), values travel as
strings so one schema covers every column type; the caller projects/casts
columns to deterministic string forms first (dates via an explicit
format, money via DECIMAL — the contract conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_null,
    n_distinct, min_val, max_val). ``n_distinct`` counts distinct
    NON-NULL values; min/max ignore NULLs (SQL agg semantics on both
    engines); string comparisons are binary-collation on both engines.
    """
    if not cols:
        raise ValueError("table_profile: need at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError(
            f"table_profile: duplicate column names in {cols} — the long-form "
            "rows would merge into one output row with doubled counts"
        )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"), F.col(c).cast("string").alias("val")
            )
            for c in cols
        ]
    )
    long = df.select(F.explode(pairs).alias("p")).select("p.col_name", "p.val")
    per_val = long.groupBy("col_name", "val").agg(F.count("*").alias("n"))
    return (
        per_val.groupBy("col_name")
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("val").isNull(), F.col("n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_null"),
            F.count("val").cast("bigint").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
    )
