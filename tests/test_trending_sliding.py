"""Operator semantics for operators/temporal.py:decayed_counts and
sliding_active_users. Cross-engine value parity lives in
tests/test_oracle_parity.py ("decayed_topics", "sliding_active_users");
these tests pin the integer-decay and replication semantics against
pure-Python replays plus the no-Window plan shape."""

from __future__ import annotations

from samu_ocr_extraction_poc_spark.operators.temporal import (
    DAY_US,
    decayed_counts,
    sliding_active_users,
)


# ---------------------------------------------------------------------------
# decayed_counts
# ---------------------------------------------------------------------------


def _py_decayed(events, anchor, scale=10_000, max_age=62, bucket_us=DAY_US):
    out = {}
    for g, t in events:
        d = t // bucket_us
        if d > anchor:
            continue
        n, s = out.get(g, (0, 0))
        out[g] = (n + 1, s + (scale >> min(anchor - d, max_age)))
    return out


def test_decayed_counts_matches_serial_replay(spark):
    D = DAY_US
    events = [
        ("a", 5 * D), ("a", 5 * D + 1),        # age 0: 10000 each
        ("a", 4 * D), ("b", 4 * D),            # age 1: 5000
        ("b", 0),                              # age 5: 312 (10000 >> 5)
        ("c", 6 * D),                          # PAST the anchor: dropped
    ]
    df = spark.createDataFrame(events, "event_type string, t long")
    got = {
        r["event_type"]: (r["n_events"], r["decayed_score"])
        for r in decayed_counts(df, anchor_day=5).collect()
    }
    assert got == _py_decayed(events, 5)
    assert got["a"] == (3, 10000 + 10000 + 5000)
    assert got["b"] == (2, 5000 + (10000 >> 5))
    assert "c" not in got


def test_decayed_counts_age_clamp(spark):
    # an event max_age+N days old contributes exactly scale >> max_age
    # (0 for the default scale — the clamp keeps the SHIFT defined, the
    # contribution has decayed away long before)
    df = spark.createDataFrame([("a", 0)], "event_type string, t long")
    got = decayed_counts(df, anchor_day=100, max_age=62).collect()[0]
    assert got["decayed_score"] == 10_000 >> 62 == 0
    got13 = decayed_counts(df, anchor_day=100, max_age=13).collect()[0]
    assert got13["decayed_score"] == 10_000 >> 13 == 1


def test_decayed_counts_plan_has_no_window(spark):
    df = spark.createDataFrame([("a", 0)], "event_type string, t long")
    plan = (
        decayed_counts(df, anchor_day=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_decayed_counts_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([("a", 0)], "event_type string, t long")
    # JVM shiftright is mod-64: an unvalidated max_age would wrap silently
    with pytest.raises(ValueError):
        decayed_counts(df, anchor_day=5, max_age=-1)
    with pytest.raises(ValueError):
        decayed_counts(df, anchor_day=5, max_age=63)
    with pytest.raises(ValueError):
        decayed_counts(df, anchor_day=5, scale=0)


# ---------------------------------------------------------------------------
# sliding_active_users
# ---------------------------------------------------------------------------


def _py_sliding(events, w=7, bucket_us=DAY_US):
    act = {(u, t // bucket_us) for u, t in events}
    dau = {}
    for u, d in act:
        dau[d] = dau.get(d, 0) + 1
    wau = {}
    for u, d in act:
        for rd in range(d, d + w):
            wau.setdefault(rd, set()).add(u)
    return {
        rd: (dau.get(rd, 0), len(us), dau.get(rd, 0) * 10000 // len(us))
        for rd, us in wau.items()
    }


def test_sliding_active_users_matches_serial_replay(spark):
    D = DAY_US
    events = [
        (1, 0), (1, 10),          # user 1 day 0 (dup collapses)
        (1, 3 * D),               # user 1 again day 3
        (2, 0),                   # user 2 day 0
        (3, 9 * D),               # user 3 day 9 (disjoint window)
    ]
    df = spark.createDataFrame(events, "user_id long, t long")
    got = {
        r["day"]: (r["dau"], r["wau"], r["stickiness_e4"])
        for r in sliding_active_users(df, window_days=7).collect()
    }
    assert got == _py_sliding(events)
    # day 3: users 1,2 in-window (day 0) + user 1's day-3 activity dedups
    assert got[3] == (1, 2, 5000)
    # trailing tail: day 6 still sees the day-0 users, day 7 does not
    assert got[6][1] == 2 and got[7][1] == 1
    # a user active twice inside one window counts ONCE
    assert got[4][1] == 2


def test_sliding_active_users_plan_has_no_window(spark):
    # eager=False keeps the full declarative lineage under inspection
    df = spark.createDataFrame([(1, 0)], "user_id long, t long")
    plan = (
        sliding_active_users(df, eager=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_sliding_active_users_guards_and_eager_parity(spark):
    import pytest

    df = spark.createDataFrame([(1, 0), (2, DAY_US)], "user_id long, t long")
    # window_days=0 would make sequence(d, d-1) DESCEND and fabricate a
    # report day before the activity (the repo's descending-sequence trap)
    with pytest.raises(ValueError):
        sliding_active_users(df, window_days=0)
    eager = sorted(map(tuple, sliding_active_users(df, eager=True).collect()))
    lazy = sorted(map(tuple, sliding_active_users(df, eager=False).collect()))
    assert eager == lazy
