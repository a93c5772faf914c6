"""Page grouping (A1/W3) and line filters (F1/F2) — SURVEY.md §2.2/§2.4.

Reference semantics (lib/text-extractor.ts:287-319 ``fetchJobOutputPages`` and
lib/pleading-extractor/stack.TextSaver.ts:15-27 ``getPageText``):

- keep ``LINE`` blocks with truthy text,
- fold into ``pages[block.Page]`` with a ``' \\n '`` separator *including
  before the first line*,
- pages are 1-based: index 0 stays an empty hole.

Our span encoding (FIXTURES.md): ``page_break`` spans carry the 1-based page
number in ``text``; ``line`` spans that follow belong to that page (page 1 if
no marker seen yet).
"""

from __future__ import annotations

PAGE_SEP = " \n "


def is_kind(span: dict, kind: str) -> bool:
    """F2 generic block-type predicate — case-insensitive
    (pleading/stack.TextSaver.ts:12-13)."""
    k = span.get("kind")
    return k is not None and k.upper() == kind.upper()


def line_texts(spans: list[dict]) -> list[str]:
    """F1: LINE filter + text projection (text-extractor.ts:172-175)."""
    return [s["text"] for s in spans if s.get("kind") == "line" and s.get("text")]


def span_pages(spans: list[dict]) -> list[tuple[int, dict]]:
    """Assign each span its 1-based page from ``page_break`` markers."""
    page = 1
    out = []
    for s in spans:
        if s.get("kind") == "page_break":
            try:
                page = int(s.get("text") or page)
            except ValueError:
                pass
        out.append((page, s))
    return out


def get_page_text(spans: list[dict]) -> list[str | None]:
    """A1: per-page ordered concat with leading ``' \\n '`` separators.

    Returns a list where index 0 is always None (the reference's 1-based
    array hole) and pages with no lines stay None.
    """
    pages: list[str | None] = [None]
    for page, s in span_pages(spans):
        if s.get("kind") != "line" or not s.get("text"):
            continue
        while len(pages) <= page:
            pages.append(None)
        pages[page] = (pages[page] or "") + PAGE_SEP + s["text"]
    return pages


def real_pages(pages: list[str | None]) -> list[str]:
    """Pages iterated the way JS ``Array.map`` skips holes — only non-empty
    slots (medical/stack.TextSaver.ts:33-35; pleading TextSaver.ts:205)."""
    return [p for p in pages if p]
