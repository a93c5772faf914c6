"""Data-LAYOUT operators: how rows are ARRANGED into files decides what a
100 TB scan must read. A filter that prunes 99% of files via footer
min/max stats beats any execution-side optimization — but footer stats
only prune if the layout puts similar rows in the same file. Z-order
(Morton-curve) clustering is the standard multi-dimensional layout:
interleave the bits of two scaled columns so one linear sort key keeps
BOTH dimensions locally bounded per file, where a plain 1-D sort bounds
only its own column (a 2-D box predicate then touches nearly every file
through the unsorted dimension).

:func:`zorder_file_stats` is the AUDIT for that decision: given a
(file = contiguous z-range) layout, it reports per-file row counts,
per-file min/max of both dimensions (exactly the footer stats a reader
prunes on), the file-level scan decision for a query box, and the true
in-box row count — so "how many files would this box actually read?" is
answerable before committing a 100 TB rewrite. Everything is exact
integer arithmetic (scale = multiply-then-DIV, interleave = DIV/%/sum of
literal powers), so the audit replays bit-identically on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_expr(cx: str, cy: str, bits: int) -> str:
    """SQL expression string for the Morton interleave of two cell
    columns in [0, 2^bits): bit i of ``cx`` lands at z-bit 2i, bit i of
    ``cy`` at z-bit 2i+1. Spelled as DIV / % / literal-power arithmetic
    (never engine bit operators) so the same string evaluates on Spark
    SQL directly and on DuckDB after the mechanical ``DIV`` -> ``//``
    respelling; used by both the operator and its oracle."""
    if not 1 <= bits <= 16:
        raise ValueError(f"zorder_expr: bits must be in [1, 16], got {bits}")
    return " + ".join(
        f"(({cx} DIV {1 << i}) % 2) * {4 ** i}"
        f" + (({cy} DIV {1 << i}) % 2) * {2 * 4 ** i}"
        for i in range(bits)
    )


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    bits: int = 8,
    cells_per_file: int = 1024,
    box: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Z-order layout audit: assign every row to the file a Morton-sorted
    write would put it in, then report per file the footer stats a
    scan-pruner sees and (optionally) the pruning outcome for one query
    box.

    Per row: each dimension clamps into [lo, hi] FIRST (the hist_build
    clamp-first rule — an unclamped outlier overflows the scale multiply
    into a wrong cell instead of raising), scales to a cell in
    [0, 2^bits) via ``(v - lo) * 2^bits DIV (hi - lo + 1)``, interleaves
    into the z-value, and files as ``z DIV cells_per_file`` — a file is
    a contiguous z-range, the exact layout a sorted-by-z bulk write
    produces. The plan is NARROW to the single partial-aggregable
    groupBy(file_id): layout auditing at 100 TB is one map stage + one
    bounded-cardinality shuffle (<= 4^bits / cells_per_file groups).

    Output per file: ``n_rows``, ``x_min/x_max/y_min/y_max`` (the footer
    stats), and with ``box=(bx_lo, bx_hi, by_lo, by_hi)`` (inclusive,
    original coordinates): ``n_in_box`` (true matching rows) and
    ``scan_needed`` (1 iff the min/max ranges overlap the box — whether
    stats-based pruning would read this file). Pruning is SOUND by
    construction: scan_needed=0 implies n_in_box=0 (pinned by test); the
    audit's value is the converse waste ratio — rows in scanned files vs
    rows actually matching. Bounds are caller-supplied (collect them
    once driver-side — the decayed_counts anchor precedent — rather than
    forcing a global min/max scan into every audit plan)."""
    if x_hi < x_lo or y_hi < y_lo:
        raise ValueError(
            f"zorder_file_stats: empty bounds x=[{x_lo},{x_hi}] "
            f"y=[{y_lo},{y_hi}]"
        )
    if cells_per_file < 1:
        raise ValueError(
            f"zorder_file_stats: cells_per_file must be >= 1, got "
            f"{cells_per_file}"
        )
    scale = 1 << bits
    span_x = x_hi - x_lo + 1
    span_y = y_hi - y_lo + 1
    # overflow guard (ADVICE r5, the hist_build clamp-first class): the
    # scale multiply's max operand is (span - 1) * 2^bits; on Spark
    # (non-ANSI) a BIGINT overflow would WRAP silently into a wrong cell
    # while DuckDB raises — a latent cross-engine divergence for extreme
    # caller-supplied bounds. Fail loud instead, like decayed_counts.
    if max(span_x - 1, span_y - 1) * scale > (1 << 63) - 1:
        raise ValueError(
            "zorder_file_stats: (hi - lo) * 2^bits exceeds BIGINT for "
            f"x=[{x_lo},{x_hi}] y=[{y_lo},{y_hi}] bits={bits}; shrink the "
            "bounds or bits"
        )
    cells = df.select(
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).select(
        "x",
        "y",
        F.expr(
            f"(least(greatest(x, {x_lo}), {x_hi}) - {x_lo}) * {scale} "
            f"DIV {span_x}"
        ).alias("cx"),
        F.expr(
            f"(least(greatest(y, {y_lo}), {y_hi}) - {y_lo}) * {scale} "
            f"DIV {span_y}"
        ).alias("cy"),
    )
    filed = cells.select(
        "x",
        "y",
        F.expr(
            f"({zorder_expr('cx', 'cy', bits)}) DIV {cells_per_file}"
        ).alias("file_id"),
    )
    aggs = [
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("x").cast("bigint").alias("x_min"),
        F.max("x").cast("bigint").alias("x_max"),
        F.min("y").cast("bigint").alias("y_min"),
        F.max("y").cast("bigint").alias("y_max"),
    ]
    if box is not None:
        bx_lo, bx_hi, by_lo, by_hi = (int(v) for v in box)
        aggs.append(
            F.sum(
                F.expr(
                    f"CAST(x >= {bx_lo} AND x <= {bx_hi} "
                    f"AND y >= {by_lo} AND y <= {by_hi} AS INT)"
                )
            )
            .cast("bigint")
            .alias("n_in_box")
        )
    out = filed.groupBy("file_id").agg(*aggs)
    if box is not None:
        out = out.withColumn(
            "scan_needed",
            F.expr(
                f"CAST(x_min <= {bx_hi} AND x_max >= {bx_lo} "
                f"AND y_min <= {by_hi} AND y_max >= {by_lo} AS INT)"
            ),
        )
    return out
