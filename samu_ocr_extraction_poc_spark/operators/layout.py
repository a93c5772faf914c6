"""Reading-order recovery (W4): interval-based column detection + recursive
XY-cut — mandated by BASELINE.json north_star; the reference delegates this
to Textract (blocks arrive pre-ordered), so there is no reference impl.

Classic recursive XY-cut (Nagy & Seth, 1984): project word boxes onto each
axis, find the widest whitespace valley exceeding a threshold, split, recurse;
leaves are emitted top-to-bottom / left-to-right, then words are grouped into
lines by vertical overlap and sorted left-to-right.

Span encoding (FIXTURES.md): ``word_box`` spans with
``text = 'word|x0,y0,x1,y1'`` (normalized page coords).
"""

from __future__ import annotations

X_GAP_MIN = 0.06  # min horizontal whitespace to call a column split
Y_GAP_MIN = 0.03  # min vertical whitespace to call a block split
LINE_OVERLAP = 0.5  # fraction of box height overlap to share a line


def parse_word_box(span: dict) -> tuple[str, float, float, float, float] | None:
    text = span.get("text") or ""
    word, _, geom = text.partition("|")
    parts = geom.split(",")
    if len(parts) != 4:
        return None
    try:
        x0, y0, x1, y1 = (float(p) for p in parts)
    except ValueError:
        return None
    return (word, x0, y0, x1, y1)


def _largest_gap(intervals: list[tuple[float, float]], min_gap: float) -> float | None:
    """Merge intervals; return the midpoint of the widest gap >= min_gap."""
    if len(intervals) < 2:
        return None
    intervals = sorted(intervals)
    merged = [list(intervals[0])]
    for lo, hi in intervals[1:]:
        if lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    best, cut = 0.0, None
    for (l0, h0), (l1, _h1) in zip(merged, merged[1:]):
        gap = l1 - h0
        if gap > best and gap >= min_gap:
            best, cut = gap, (h0 + l1) / 2.0
    return cut


def _xy_cut(boxes: list[tuple], vertical_first: bool = True) -> list[list[tuple]]:
    """Recursive XY-cut -> ordered leaf regions of word boxes."""
    if len(boxes) <= 1:
        return [boxes]
    # try the preferred axis, then the other
    for axis in (("x", "y") if vertical_first else ("y", "x")):
        if axis == "x":
            cut = _largest_gap([(b[1], b[3]) for b in boxes], X_GAP_MIN)
            if cut is not None:
                left = [b for b in boxes if (b[1] + b[3]) / 2 < cut]
                right = [b for b in boxes if (b[1] + b[3]) / 2 >= cut]
                if left and right:
                    return _xy_cut(left, False) + _xy_cut(right, False)
        else:
            cut = _largest_gap([(b[2], b[4]) for b in boxes], Y_GAP_MIN)
            if cut is not None:
                top = [b for b in boxes if (b[2] + b[4]) / 2 < cut]
                bot = [b for b in boxes if (b[2] + b[4]) / 2 >= cut]
                if top and bot:
                    return _xy_cut(top, False) + _xy_cut(bot, False)
    return [boxes]


def _group_lines(boxes: list[tuple]) -> list[str]:
    """Group a leaf region's words into lines by y-overlap; join
    left-to-right."""
    if not boxes:
        return []
    boxes = sorted(boxes, key=lambda b: (b[2], b[1]))
    lines: list[list[tuple]] = []
    for b in boxes:
        placed = False
        for line in lines:
            ly0 = min(x[2] for x in line)
            ly1 = max(x[4] for x in line)
            overlap = min(ly1, b[4]) - max(ly0, b[2])
            h = min(ly1 - ly0, b[4] - b[2]) or 1e-9
            if overlap / h >= LINE_OVERLAP:
                line.append(b)
                placed = True
                break
        if not placed:
            lines.append([b])
    lines.sort(key=lambda line: min(x[2] for x in line))
    return [" ".join(w[0] for w in sorted(line, key=lambda x: x[1])) for line in lines]


def reading_order_lines(spans: list[dict]) -> list[str]:
    """word_box spans -> ordered line texts (column-aware)."""
    boxes = [b for b in (parse_word_box(s) for s in spans if s.get("kind") == "word_box") if b]
    if not boxes:
        return []
    out: list[str] = []
    for region in _xy_cut(boxes):
        out.extend(_group_lines(region))
    return out
