"""Operator semantics for operators/profile.py (table_profile) and
operators/temporal.py:cohort_retention. Cross-engine value parity lives in
tests/test_oracle_parity.py ("table_profile", "cohort_retention",
"salted_join_check"); these tests pin the semantics against pure-Python
replays and the shape guarantees (no Window operator in either plan)."""

from __future__ import annotations

import pytest

from samu_ocr_extraction_poc_spark.operators.profile import table_profile
from samu_ocr_extraction_poc_spark.operators.temporal import DAY_US, cohort_retention


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------


def _py_cohort(events, bucket_us=DAY_US):
    """Serial replay: events = [(user, t_us)]."""
    active = {(u, t // bucket_us) for u, t in events}
    cohort = {}
    for u, d in active:
        cohort[u] = min(cohort.get(u, d), d)
    sizes = {}
    for u, cd in cohort.items():
        sizes[cd] = sizes.get(cd, 0) + 1
    cells = {}
    for u, d in active:
        key = (cohort[u], d - cohort[u])
        cells[key] = cells.get(key, 0) + 1
    return {
        (cd, age): (n, sizes[cd], n * 10000 // sizes[cd])
        for (cd, age), n in cells.items()
    }


def test_cohort_retention_matches_serial_replay(spark):
    D = DAY_US
    events = [
        # user 1: days 0, 1, 3 (plus a same-day duplicate that must collapse)
        (1, 0), (1, 10), (1, D + 5), (1, 3 * D),
        # user 2: day 0 only
        (2, D - 1),
        # user 3: cohort day 1, returns day 3
        (3, D), (3, 3 * D + 7),
        # user 4: cohort day 1
        (4, D + 123),
    ]
    df = spark.createDataFrame(events, "user_id long, t long")
    got = {
        (r["cohort_day"], r["age_days"]): (
            r["active_users"], r["cohort_users"], r["retention_e4"]
        )
        for r in cohort_retention(df).collect()
    }
    assert got == _py_cohort(events)
    # age-0 cell is the cohort itself: retention is exactly 10000
    for (cd, age), (n, size, e4) in got.items():
        if age == 0:
            assert n == size and e4 == 10000
    # day-0 cohort = users 1,2; only user 1 returns on day 1 -> 5000
    assert got[(0, 1)] == (1, 2, 5000)
    # day-1 cohort = users 3,4; user 3 returns at age 2 -> 5000
    assert got[(1, 2)] == (1, 2, 5000)


def test_cohort_retention_plan_has_no_window(spark):
    # eager=False keeps the full declarative lineage under inspection
    df = spark.createDataFrame([(1, 0), (2, DAY_US)], "user_id long, t long")
    plan = (
        cohort_retention(df, eager=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_cohort_retention_eager_matches_lazy(spark):
    df = spark.createDataFrame(
        [(1, 0), (1, DAY_US), (2, 0), (3, 2 * DAY_US)], "user_id long, t long"
    )
    eager = sorted(map(tuple, cohort_retention(df, eager=True).collect()))
    lazy = sorted(map(tuple, cohort_retention(df, eager=False).collect()))
    assert eager == lazy


# ---------------------------------------------------------------------------
# table_profile
# ---------------------------------------------------------------------------


def test_table_profile_matches_serial_replay(spark):
    rows = [
        ("a", 1, None),
        ("a", 2, "x"),
        ("b", 2, "x"),
        (None, 3, "y"),
        ("c", None, None),
    ]
    df = spark.createDataFrame(rows, "s string, i int, t string")
    got = {
        r["col_name"]: (
            r["n_rows"], r["n_null"], r["n_distinct"], r["min_val"], r["max_val"]
        )
        for r in table_profile(df, ["s", "i", "t"]).collect()
    }
    # n_distinct counts non-NULL distinct; min/max ignore NULLs
    assert got == {
        "s": (5, 1, 3, "a", "c"),
        "i": (5, 1, 3, "1", "3"),
        "t": (5, 2, 2, "x", "y"),
    }


def test_table_profile_subset_and_empty_cols(spark):
    df = spark.createDataFrame([("a", 1)], "s string, i int")
    out = table_profile(df, ["i"]).collect()
    assert len(out) == 1 and out[0]["col_name"] == "i"
    with pytest.raises(ValueError):
        table_profile(df, [])
    with pytest.raises(ValueError):
        table_profile(df, ["s", "s"])


def test_table_profile_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "s string")
    r = table_profile(df, ["s"]).collect()[0]
    assert (r["n_rows"], r["n_null"], r["n_distinct"]) == (2, 2, 0)
    assert r["min_val"] is None and r["max_val"] is None


def test_table_profile_plan_has_no_window(spark):
    df = spark.createDataFrame([("a", 1)], "s string, i int")
    plan = table_profile(df, ["s", "i"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
