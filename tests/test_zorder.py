"""Operator semantics for operators/storage.py (z-order layout audit).
Cross-engine value parity lives in tests/test_oracle_parity.py
("zorder_layout"); these tests pin the Morton interleave and the file
stats against a pure-Python replay, the pruning-soundness guarantee, the
locality property that justifies the layout (a 2-D box scans fewer
z-order files than 1-D-sorted files), and the plan shape."""

from __future__ import annotations

import hashlib

import pytest

from samu_ocr_extraction_poc_spark.operators.storage import (
    zorder_expr,
    zorder_file_stats,
)


def _interleave(cx: int, cy: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z += ((cx >> i) & 1) << (2 * i)
        z += ((cy >> i) & 1) << (2 * i + 1)
    return z


def _py_stats(rows, x_lo, x_hi, y_lo, y_hi, bits, cells_per_file, box):
    scale = 1 << bits
    sx, sy = x_hi - x_lo + 1, y_hi - y_lo + 1
    bx_lo, bx_hi, by_lo, by_hi = box
    files: dict[int, dict] = {}
    for x, y in rows:
        cx = (min(max(x, x_lo), x_hi) - x_lo) * scale // sx
        cy = (min(max(y, y_lo), y_hi) - y_lo) * scale // sy
        fid = _interleave(cx, cy, bits) // cells_per_file
        st = files.setdefault(
            fid,
            {"n": 0, "xmin": x, "xmax": x, "ymin": y, "ymax": y, "inbox": 0},
        )
        st["n"] += 1
        st["xmin"] = min(st["xmin"], x)
        st["xmax"] = max(st["xmax"], x)
        st["ymin"] = min(st["ymin"], y)
        st["ymax"] = max(st["ymax"], y)
        st["inbox"] += int(bx_lo <= x <= bx_hi and by_lo <= y <= by_hi)
    for st in files.values():
        st["scan"] = int(
            st["xmin"] <= bx_hi
            and st["xmax"] >= bx_lo
            and st["ymin"] <= by_hi
            and st["ymax"] >= by_lo
        )
    return files


def _det_rows(n: int, x_hi: int, y_hi: int):
    """Deterministic pseudo-random points via md5 (never random.seed —
    the repo's retry-determinism convention)."""
    out = []
    for i in range(n):
        h = hashlib.md5(f"zo:{i}".encode()).hexdigest()
        out.append((int(h[:6], 16) % (x_hi + 1), int(h[6:12], 16) % (y_hi + 1)))
    return out


def test_zorder_matches_serial_replay_including_clamped_outliers(spark):
    rows = _det_rows(300, 99, 99) + [(-5, 3), (250, 120), (42, -1)]
    box = (25, 49, 25, 49)
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        r["file_id"]: r.asDict()
        for r in zorder_file_stats(
            df, "x", "y", 0, 99, 0, 99, bits=4, cells_per_file=8, box=box
        ).collect()
    }
    want = _py_stats(rows, 0, 99, 0, 99, 4, 8, box)
    assert set(got) == set(want)
    for fid, st in want.items():
        g = got[fid]
        assert (
            g["n_rows"], g["x_min"], g["x_max"], g["y_min"], g["y_max"],
            g["n_in_box"], g["scan_needed"],
        ) == (
            st["n"], st["xmin"], st["xmax"], st["ymin"], st["ymax"],
            st["inbox"], st["scan"],
        )


def test_zorder_pruning_is_sound(spark):
    # scan_needed = 0 must imply n_in_box = 0: stats pruning never drops
    # a matching row
    rows = _det_rows(500, 255, 255)
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_file_stats(
        df, "x", "y", 0, 255, 0, 255, bits=8, cells_per_file=1024,
        box=(64, 127, 64, 127),
    ).collect()
    assert any(r["scan_needed"] == 0 for r in out)  # pruning non-vacuous
    for r in out:
        if r["scan_needed"] == 0:
            assert r["n_in_box"] == 0


def test_zorder_beats_one_dimensional_sort_for_2d_box():
    # the property the layout exists for, on the replay arithmetic: a
    # y-selective box over an x-SORTED layout (file = contiguous cx
    # range, every file spans all of y) scans every file; the z-order
    # layout keeps y locally bounded per file and scans a strict subset
    bits, cpf = 4, 16  # 256 cells -> 16 files either way
    full = [(x, y) for x in range(16) for y in range(16)]
    box = (0, 15, 4, 7)  # all of x, a quarter band of y
    z = _py_stats(full, 0, 15, 0, 15, bits, cpf, box)
    z_scanned = sum(st["scan"] for st in z.values())
    xsorted: dict[int, dict] = {}
    for x, y in full:
        st = xsorted.setdefault(x, {"ymin": y, "ymax": y})
        st["ymin"] = min(st["ymin"], y)
        st["ymax"] = max(st["ymax"], y)
    x_scanned = sum(
        1 for st in xsorted.values() if st["ymin"] <= 7 and st["ymax"] >= 4
    )
    assert x_scanned == 16
    assert z_scanned < x_scanned


def test_zorder_expr_validates_bits_and_bounds(spark):
    with pytest.raises(ValueError, match="bits"):
        zorder_expr("cx", "cy", 0)
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError, match="empty bounds"):
        zorder_file_stats(df, "x", "y", 5, 4, 0, 9)
    with pytest.raises(ValueError, match="cells_per_file"):
        zorder_file_stats(df, "x", "y", 0, 9, 0, 9, cells_per_file=0)
    # span * 2^bits past BIGINT would WRAP on Spark (non-ANSI) where DuckDB
    # raises — the guard fails loud instead (ADVICE r5)
    with pytest.raises(ValueError, match="exceeds BIGINT"):
        zorder_file_stats(df, "x", "y", 0, (1 << 60) - 1, 0, 9, bits=16)
    # a span that exactly fits stays accepted
    zorder_file_stats(df, "x", "y", 0, (1 << 40) - 1, 0, 9, bits=16)


def test_zorder_plan_is_one_bounded_groupby_no_window(spark):
    df = spark.createDataFrame(_det_rows(50, 31, 31), "x long, y long")
    plan = (
        zorder_file_stats(
            df, "x", "y", 0, 31, 0, 31, bits=5, cells_per_file=64,
            box=(4, 9, 4, 9),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
