"""Small literal DataFrames as pure-JVM LocalRelations.

``spark.createDataFrame(py_rows, ...)`` builds a PYTHON-RDD-backed frame:
every action that touches it — including a 2-row sketch-meta sentinel
read — schedules a distributed job that spins a Python worker to unpickle
the rows (profiled 0.3-1.2 s per collect at bench scale). A SQL ``VALUES``
list parses to a LocalRelation instead: joins broadcast it from the
driver, sentinel collects are driver-local, and no Python worker is ever
involved. Value-identical — the same literals, typed by explicit CASTs.

Use for the package's bounded literal tables (sketch meta sentinels,
percentile lists, shard offset tables, merge tables); NOT for anything
data-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v, typ: str) -> str:
    t = typ.strip().upper()
    if v is None:
        return f"CAST(NULL AS {t})"
    if t in ("STRING", "VARCHAR"):
        escaped = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if t == "DOUBLE":
        return f"CAST({float(v)!r} AS DOUBLE)"
    return f"CAST({int(v)} AS {t})"


def values_frame(spark: SparkSession, rows: list[tuple], ddl: str) -> DataFrame:
    """Literal frame from ``rows`` with the ``"name type, name type"``
    DDL schema, built as a SQL VALUES LocalRelation (see module doc).
    ``rows`` must be non-empty (SQL VALUES cannot be empty)."""
    if not rows:
        raise ValueError("values_frame needs at least one row")
    cols = [c.strip().rsplit(" ", 1) for c in ddl.split(",")]
    names = ", ".join(n.strip() for n, _ in cols)
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v, t) for v, (_, t) in zip(r, cols)) + ")"
        for r in rows
    )
    return spark.sql(f"SELECT * FROM (VALUES {values}) AS t({names})")
