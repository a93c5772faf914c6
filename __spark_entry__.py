"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (the full Arrow UDF
engine over an interleaved corpus synthesized deterministically from
sf0.001's documents table). ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the training-data pipeline ops;
see samu_ocr_extraction_poc_spark/contract.py for the implementations and
the oracle-parity design notes.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from samu_ocr_extraction_poc_spark.contract import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["extract_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracles; the two wide-row Arrow engine ops
    (extract_pipeline, html_strip) are intentionally absent -> rows-only
    checks (their routing/span/byte totals are oracled via the
    extract_*_check entries)."""
    return dict(ORACLE_SQL)
