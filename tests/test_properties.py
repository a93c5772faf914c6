"""Property-based tests (SURVEY.md §5 item 3) — hypothesis over the pure
per-document operators."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from samu_ocr_extraction_poc_spark.functions.scalars import (
    js_parse_float,
    parse_document_value,
    sanitize_expense_value,
    to_fixed_2,
)
from samu_ocr_extraction_poc_spark.operators.html import strip_boilerplate
from samu_ocr_extraction_poc_spark.operators.layout import reading_order_lines
from samu_ocr_extraction_poc_spark.operators.medical import dedup_keep_first
from samu_ocr_extraction_poc_spark.operators.pages import get_page_text

_SETTINGS = settings(max_examples=60, deadline=None)

money = st.decimals(min_value=0, max_value=10**9, places=2, allow_nan=False, allow_infinity=False)


@_SETTINGS
@given(money)
def test_money_parse_format_roundtrip(x):
    """parse(format(x)) == x for 2-decimal money (C2-C4)."""
    s = f"${x:,.2f}"
    parsed = parse_document_value(s)
    assert parsed is not None
    assert to_fixed_2(parsed) == f"{x:.2f}"


@_SETTINGS
@given(st.text())
def test_sanitize_idempotent_and_clean(s):
    out = sanitize_expense_value(s)
    assert "$" not in out and "," not in out
    assert sanitize_expense_value(out) == out.strip()


@_SETTINGS
@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_js_parse_float_parses_python_repr(x):
    assert js_parse_float(repr(float(x))) == float(x)


@_SETTINGS
@given(st.lists(st.tuples(st.sampled_from("abcdef"), st.integers(0, 5)), max_size=30))
def test_dedup_keep_first_properties(pairs):
    items = [{"code": c, "v": v} for c, v in pairs]
    out = dedup_keep_first(items, "code")
    # idempotent
    assert dedup_keep_first(out, "code") == out
    # keeps first occurrence per key, in order
    seen = {}
    for it in items:
        seen.setdefault(it["code"], it)
    assert out == list(seen.values())


@_SETTINGS
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("line"), st.text(alphabet="xyz ", min_size=1, max_size=8)),
            st.tuples(st.just("page_break"), st.integers(1, 5).map(str)),
            st.tuples(st.just("media"), st.just("")),
        ),
        max_size=40,
    )
)
def test_page_text_invariants(items):
    spans = [
        {"kind": k, "text": t, "media_ref": "", "offset": i} for i, (k, t) in enumerate(items)
    ]
    pages = get_page_text(spans)
    assert pages[0] is None
    n_lines = sum(1 for k, t in items if k == "line" and t)
    total_seps = sum((p or "").count(" \n ") for p in pages)
    assert total_seps == n_lines  # exactly one leading separator per line
    # non-line spans never contribute text
    joined = "".join(p or "" for p in pages)
    assert joined.replace(" \n ", "|", 10**6).count("|") == n_lines


@_SETTINGS
@given(st.permutations(list(range(8))))
def test_xy_cut_input_order_invariance(perm):
    boxes = [
        ("Left", 0.05, 0.10, 0.15, 0.13), ("one", 0.17, 0.10, 0.25, 0.13),
        ("Left", 0.05, 0.16, 0.15, 0.19), ("two", 0.17, 0.16, 0.25, 0.19),
        ("Right", 0.55, 0.10, 0.68, 0.13), ("one", 0.70, 0.10, 0.78, 0.13),
        ("Right", 0.55, 0.16, 0.68, 0.19), ("two", 0.70, 0.16, 0.78, 0.19),
    ]
    spans = [
        {"kind": "word_box", "text": f"{w}|{x0},{y0},{x1},{y1}"}
        for (w, x0, y0, x1, y1) in (boxes[i] for i in perm)
    ]
    assert reading_order_lines(spans) == ["Left one", "Left two", "Right one", "Right two"]


@_SETTINGS
@given(st.lists(st.text(alphabet="abcdefg ", min_size=40, max_size=80), min_size=1, max_size=4))
def test_html_strip_output_text_from_input(paras):
    html = "<html><body><nav><a href='/'>x</a></nav>" + "".join(
        f"<p>{p}</p>" for p in paras
    ) + "</body></html>"
    blocks = strip_boilerplate(html)
    norm_input = re.sub(r"\s+", " ", " ".join(paras))
    for b in blocks:
        assert b in norm_input or all(w in norm_input for w in b.split())


_KINDS = [
    "line", "page_break", "media", "html", "email", "transcript_utt",
    "med_entity", "expense_field", "expense_item", "query", "query_result",
    "word_box", "garbage_kind",
]


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(_KINDS),
            st.text(max_size=40),
            st.text(alphabet="abc0123456789-,|.", max_size=12),
        ),
        max_size=25,
    )
)
def test_extract_document_total_and_deterministic(items):
    """The extraction stage must be total (malformed payloads, bogus kinds,
    broken JSON, junk geometry -> never an unhandled exception; BadFormat
    only surfaces as a status row) and deterministic."""
    from samu_ocr_extraction_poc_spark.plans.pipeline import extract_document

    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(items)
    ]
    a = extract_document("fuzz", [dict(s) for s in spans], {"x": "y"})
    b = extract_document("fuzz", [dict(s) for s in spans], {"x": "y"})
    assert a == b
    assert a["status"] in ("done", "error")
    outs = a["out_spans"]
    assert [s["offset"] for s in outs] == list(range(len(outs)))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("line"), st.text(alphabet="ab ", min_size=1, max_size=6)),
            st.tuples(st.just("page_break"), st.integers(1, 99).map(str)),
        ),
        max_size=60,
    ),
    st.integers(1, 7),
)
def test_split_by_pages_preserves_content(items, chunk):
    """Property: page-aligned chunking loses no spans, keeps order, and each
    non-first chunk starts at a page_break (pure-Python mirror of the
    Column logic, exercised against the Spark version in test_scale_paths)."""
    spans = [
        {"kind": k, "text": t, "media_ref": "", "offset": i}
        for i, (k, t) in enumerate(items)
    ]
    # replicate split_by_pages semantics in Python
    breaks = [i for i, s in enumerate(spans) if s["kind"] == "page_break"]
    starts = sorted(set([0] + [b for j, b in enumerate(breaks) if j % chunk == 0]))
    ends = starts[1:] + [len(spans)]
    chunks = [spans[s:e] for s, e in zip(starts, ends) if e > s]
    flat = [s for c in chunks for s in c]
    assert flat == spans  # nothing lost, order preserved
    for c in chunks[1:]:
        assert c[0]["kind"] == "page_break"


@_SETTINGS
@given(st.lists(st.sampled_from("abcde"), max_size=30))
def test_ordered_distinct_properties(items):
    """A2: insertion-ordered distinct — subsequence of input, first
    occurrences only, idempotent."""
    from samu_ocr_extraction_poc_spark.functions.nlp import _ordered_distinct

    out = _ordered_distinct(items)
    assert len(out) == len(set(items))
    assert out == _ordered_distinct(out)
    # order = first-occurrence order
    seen = []
    for x in items:
        if x not in seen:
            seen.append(x)
    assert out == seen
