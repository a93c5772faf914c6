"""Skew discipline for multi-hundred-page filings (north_rule; SURVEY.md §7).

A 400-page document is one row with ~12k spans: untouched, it serializes
into a single task and dominates its partition. The scalable formulation:

1. :func:`split_by_pages` — in-row, pure Column logic: find ``page_break``
   positions with array HOFs and slice the span array into page-aligned
   chunks (each chunk starts at a page break, so per-chunk page grouping is
   complete — no cross-chunk text merge needed).
2. explode chunks -> bounded rows -> the same Arrow extraction/grouping
   code runs per chunk in parallel.
3. :func:`pages_distributed` — regroup the (small) per-page texts per doc.

The same split feeds the salted repartition: chunk rows hash uniformly, so
AQE sees no hot partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def split_by_pages(docs: DataFrame, pages_per_chunk: int = 25) -> DataFrame:
    """documents(doc_id, spans) -> (doc_id, chunk_id, spans) with each chunk
    covering `pages_per_chunk` page_break-aligned page groups.

    Pure JVM array algebra: no UDF, no shuffle. Docs without page breaks
    come through as one chunk.
    """
    spans = F.col("spans")
    n = F.size(spans)
    # 0-based indices of page_break spans (document order == array order)
    breaks = F.filter(
        F.transform(spans, lambda s, i: F.when(s["kind"] == "page_break", i).otherwise(-1)),
        lambda x: x >= 0,
    )
    # chunk start indices: every pages_per_chunk'th break; always include 0
    starts = F.array_distinct(
        F.concat(
            F.array(F.lit(0)),
            F.filter(
                F.transform(breaks, lambda b, i: F.when(i % pages_per_chunk == 0, b).otherwise(-1)),
                lambda x: x >= 0,
            ),
        )
    )
    ends = F.concat(F.slice(starts, 2, 2_000_000), F.array(n))
    chunks = F.zip_with(
        starts,
        ends,
        lambda s, e: F.slice(spans, s + 1, F.greatest(e - s, F.lit(0))),
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "spans")
    ).where(F.size("spans") > 0)


def pages_distributed(docs: DataFrame, pages_per_chunk: int = 25) -> DataFrame:
    """A1 page grouping, skew-immune: split -> per-chunk Arrow grouping ->
    per-doc regroup of small page texts.

    Returns (doc_id, page, page_text) rows with the reference's leading
    ``' \\n '`` separators (text-extractor.ts:287-319).
    """
    import pandas as pd

    from .pages import get_page_text

    chunks = split_by_pages(docs, pages_per_chunk)

    def _chunk_pages(batches):
        for pdf in batches:
            rows = []
            for doc_id, chunk_id, spans in zip(pdf["doc_id"], pdf["chunk_id"], pdf["spans"]):
                pages = get_page_text(list(spans))
                for page, text in enumerate(pages):
                    if text:
                        rows.append(
                            {"doc_id": doc_id, "chunk_id": int(chunk_id), "page": page, "page_text": text}
                        )
            yield pd.DataFrame(rows, columns=["doc_id", "chunk_id", "page", "page_text"])

    per_chunk = chunks.mapInPandas(
        _chunk_pages, "doc_id string, chunk_id int, page int, page_text string"
    )
    # chunks are page-aligned, so (doc_id, page) is unique across chunks for
    # marker-bearing docs; docs without markers default every chunk to page 1,
    # so concatenate in chunk order for exact get_page_text parity.
    return (
        per_chunk.groupBy("doc_id", "page")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("chunk_id", "page_text"))),
                    lambda s: s["page_text"],
                ),
            ).alias("page_text")
        )
        .select("doc_id", "page", "page_text")
    )
