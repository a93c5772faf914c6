"""Temporal joins the DataFrame API lacks: as-of join and range join.

Two of the classic "Spark has no operator for this" cases (the others in
this package: exact-substring dedup, banded LSH, the sketch family). The
naive formulations are scale-killers:

- as-of join as ``row_number() OVER (PARTITION BY key ORDER BY t)`` over
  the unioned streams puts EVERY row of a key into one window partition
  (a hot key's full history on one task);
- range join as ``l.t BETWEEN r.lo AND r.hi`` compiles to
  BroadcastNestedLoopJoin (or a per-key cartesian) — quadratic in key
  frequency.

Both operators here reduce to EQUI-joins on (key, time-bucket), so the
shuffle is hash-partitioned, AQE-skew-splittable, and co-partitionable
with an upstream bucketed layout. The only window is the as-of carry: per
key over its DISTINCT BUCKETS (timespan / bucket_width rows, never
row-count-sized). Everything is integer microsecond arithmetic, so DuckDB
replays results exactly — the as-of contract entry is oracled against
DuckDB's NATIVE ``ASOF JOIN``, proving the distributed two-phase
formulation equals the serial definition (the shuffle_order proof shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# one day in microseconds — a sane default bucket for event streams
DAY_US = 86_400_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "k",
    time_col: str = "t",
    bucket_us: int = DAY_US,
) -> DataFrame:
    """Backward as-of join: for every left row, the right row with the
    LARGEST ``time_col`` <= the left row's time, per ``key_col`` — "the
    most recent prior observation" (trade-to-quote, event-to-state,
    click-to-impression attribution).

    Semantics contract:
    - inclusive (``r.t <= l.t``; a simultaneous right row matches);
    - ties on (key, t) within the right side resolve by the LARGEST
      remaining struct (deterministic lexicographic tie-break on the
      right payload columns, in their column order);
    - left rows with no eligible right row survive with NULL matches
      (left-outer semantics).

    Distributed construction (equi-joins only; the scale argument):

    1. both sides get ``b = t DIV bucket_us``;
    2. per (key, b), the right side's best candidate-for-carry is ONE
       partial-aggregable max-struct agg;
    3. the carry axis = distinct (key, b) over BOTH sides; a window per
       key ordered by b (rows: the key's DISTINCT BUCKETS — bounded by
       timespan/bucket_us, never by row count) forward-folds the best
       right row of all STRICTLY EARLIER buckets;
    4. candidates per left row = same-bucket right rows with
       ``r.t <= l.t`` (equi-join on (key, b) — bucket_us bounds the
       fan-in) ∪ the carry at the left row's own bucket (equi-join,
       left-outer, always eligible since earlier-bucket times are
       < b*bucket_us <= l.t);
    5. one max-struct agg per left row picks the winner.

    The left frame must carry a unique row identity: all its columns are
    grouped on in step 5 (pass a frame with an id column and whatever
    payload you need downstream). Right columns come back as
    ``matched_<col>`` (NULL when unmatched).
    """
    lb = left.withColumn("__b", F.expr(f"{time_col} DIV {bucket_us}"))
    rpay = [c for c in right.columns if c != key_col]
    cand = F.struct(*[F.col(c) for c in [time_col] + [c for c in rpay if c != time_col]])
    rb = right.select(
        F.col(key_col), F.expr(f"{time_col} DIV {bucket_us}").alias("__b"), cand.alias("__cand")
    )
    rbest = rb.groupBy(key_col, "__b").agg(F.max("__cand").alias("__best"))
    axis = (
        lb.select(key_col, "__b")
        .union(rb.select(key_col, "__b"))
        .distinct()
        .join(rbest, [key_col, "__b"], "left")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = axis.select(
        key_col, "__b", F.max("__best").over(w).alias("__cand")
    )
    in_bucket = lb.join(rb, [key_col, "__b"]).where(
        F.col(f"__cand.{time_col}") <= F.col(time_col)
    )
    carried = lb.join(carry, [key_col, "__b"], "left")
    lcols = [c for c in left.columns]
    best = (
        in_bucket.select(*lcols, "__cand")
        .unionByName(carried.select(*lcols, "__cand"))
        .groupBy(*lcols)
        .agg(F.max("__cand").alias("__m"))
    )
    out_cols = [F.col(c) for c in lcols]
    out_cols.append(F.col(f"__m.{time_col}").alias(f"matched_{time_col}"))
    for c in rpay:
        if c != time_col:
            out_cols.append(F.col(f"__m.{c}").alias(f"matched_{c}"))
    return best.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str = "k",
    time_col: str = "t",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_us: int = DAY_US,
    max_len_us: int | None = None,
) -> DataFrame:
    """Interval (range) join: every (point, interval) pair with the same
    key and ``lo <= t <= hi`` — sessions-to-events, validity windows,
    campaign attribution.

    Each interval is replicated to the buckets it overlaps (at most
    len/bucket_us + 1 copies — ``max_len_us`` enforces the bound the
    plan's cost argument rests on; an unbounded interval would replicate
    without limit, so violations RAISE at plan build rather than
    degrade), points carry their single bucket, and the match is an
    EQUI-join on (key, bucket) + the residual BETWEEN filter. A pair
    meets in exactly one bucket (the point's), so no dedup pass is
    needed. Returns the point columns + the interval columns.
    """
    if max_len_us is not None:
        too_long = intervals.where(
            F.col(hi_col) - F.col(lo_col) > max_len_us
        ).limit(1).count()
        if too_long:
            raise ValueError(
                f"range_join: interval longer than max_len_us={max_len_us} — "
                "replication bound violated; widen max_len_us or split intervals"
            )
    pb = points.withColumn("__b", F.expr(f"{time_col} DIV {bucket_us}"))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} DIV {bucket_us}"),
                F.expr(f"{hi_col} DIV {bucket_us}"),
            )
        ),
    )
    return (
        pb.join(ib, [key_col, "__b"])
        .where(
            (F.col(time_col) >= F.col(lo_col)) & (F.col(time_col) <= F.col(hi_col))
        )
        .drop("__b")
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "t",
) -> DataFrame:
    """Strictly-ordered funnel conversion (the product-analytics staple;
    same semantics as ClickHouse windowFunnel in strict_order-less mode
    with an unbounded window): per user, t1 = min time of stages[0],
    t_i = min time of stages[i-1] events STRICTLY AFTER t_{i-1}. A user
    reaches stage i iff t_i exists.

    Distributed shape: one conditional min-agg per stage plus one
    user-keyed join back — every shuffle is on the user key and every
    aggregation is partial-aggregable, so a hot user costs one combiner
    row per stage rather than the full event history in one partition
    (the window/sort formulation's failure mode). The stage frames shrink
    monotonically (converters only), so later joins are against
    ever-smaller sides.

    Returns one row per stage-1 user: (user, t1..tn with -1 for
    not-reached, reached = highest stage index attained). Strict `>` at
    every hop is pinned semantics (an event at exactly t_{i-1} does not
    convert), integer time units end-to-end.
    """
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), F.col(time_col).alias("t")
    )
    cur = (
        ev.where(F.col("et") == stages[0])
        .groupBy("u")
        .agg(F.min("t").alias("t1"))
    )
    for i in range(2, len(stages) + 1):
        prev = f"t{i - 1}"
        nxt = (
            ev.where(F.col("et") == stages[i - 1])
            .join(cur.select("u", prev), "u")
            .where(F.col("t") > F.col(prev))
            .groupBy("u")
            .agg(F.min("t").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "u", "left")
    reached = F.lit(1)
    for i in range(2, len(stages) + 1):
        reached = reached + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return cur.select(
        F.col("u").alias(user_col),
        *[
            F.coalesce(F.col(f"t{i}"), F.lit(-1)).cast("bigint").alias(f"t{i}_us")
            for i in range(1, len(stages) + 1)
        ],
        reached.cast("bigint").alias("reached"),
    )
