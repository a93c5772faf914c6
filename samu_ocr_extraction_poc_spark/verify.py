"""Span-sequence equality verification (the north_rule per-row invariant).

``span_equality_report`` joins engine results against a golden table and
scores each document on ordered (kind, text, media_ref) equality — order is
what offsets encode, so sequences are compared element-wise after sorting by
offset. The aggregate pass rate is the correctness gate (must be 1.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(spans_col: str):
    """Order by offset, drop the offset (order-carrying only), keep the
    (kind, text, media_ref) triple per element."""
    ordered = F.expr(f"array_sort({spans_col}, (a, b) -> a.offset - b.offset)")
    return F.transform(ordered, lambda s: F.struct(s["kind"], s["text"], s["media_ref"]))


def span_equality_report(results: DataFrame, expected: DataFrame) -> DataFrame:
    """Per-doc comparison: (doc_id, equal boolean, n_out, n_expected)."""
    r = results.select("doc_id", _canon("out_spans").alias("got"))
    e = expected.select("doc_id", _canon("spans").alias("want"))
    return r.join(e, "doc_id", "full").select(
        "doc_id",
        (F.col("got") == F.col("want")).alias("equal"),
        F.size("got").alias("n_out"),
        F.size("want").alias("n_expected"),
    )


def pass_rate(report: DataFrame) -> float:
    row = report.agg(
        F.avg(F.when(F.col("equal"), 1.0).otherwise(0.0)).alias("rate")
    ).collect()[0]
    return float(row["rate"])
