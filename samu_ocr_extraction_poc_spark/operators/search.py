"""Lexical retrieval over the corpus: relational BM25 top-k.

The textual counterpart of the embedding similarity family — used in
training-data pipelines for benchmark decontamination sweeps, targeted
quality audits, and retrieval-augmented corpus construction. Everything is
DataFrame-native over the token inverted index; the only non-rational
arithmetic (ln in idf, the tf saturation) is quantized/rounded so the
DuckDB oracle reproduces scores bit-for-bit after round(4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import normalized, tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms (no ranking).

    Construction (all relational, one pass over the token explode):
    - doc length dl = token count of the normalized text; avgdl computed as
      exact integer sum / count (both engines agree bit-for-bit, unlike a
      running-mean avg());
    - the exploded token stream is filtered to the query terms FIRST — the
      per-term tf/df aggregation touches only matching rows, so the
      expensive part scales with hits, not corpus size;
    - idf = ln((N - df + 0.5)/(df + 0.5) + 1) rounded to 6 decimals before
      use: ln() is only ~1-ulp accurate on both engines, quantizing makes
      the downstream products engine-identical;
    - score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
      rounded to 4 decimals so downstream rank tie-breaks (doc_id) are
      cross-engine deterministic.

    Returns (doc_id, score) for matching documents only.
    """
    terms = [t.lower() for t in query_terms]
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalized(F.col(text_col))).alias("toks"),
    ).select(
        "doc_id",
        F.explode("toks").alias("term"),
        F.size("toks").cast("bigint").alias("dl"),
    )
    # dl repeats per token row; doc-level lengths for avgdl come from a
    # distinct pass so each doc counts once
    doc_len = base.select("doc_id", "dl").distinct()
    corpus_stats = doc_len.groupBy().agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    hits = base.where(F.col("term").isin(terms))
    tf = hits.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf"), F.first("dl").alias("dl")
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("dft"))
    scored_terms = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(corpus_stats))
        .select(
            "doc_id",
            (
                F.round(
                    F.log(
                        (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
                        + 1.0
                    ),
                    6,
                )
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return scored_terms.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 4).alias("score")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k documents for a bag of query terms.

    Ranking is distributed top-k, never a global window: round-2 used
    ``row_number() OVER (ORDER BY score)`` with no partition key, which
    Spark executes by moving EVERY matching document through one partition
    ("No Partition Defined for Window operation") — a scale-killer for
    common query terms (billions of hits at 10^12 docs). Here
    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: each
    partition keeps its local top k, the driver merges k·P rows. The rank
    is then derived on the k-row result via a broadcast self-join count
    (rank = 1 + #rows strictly better) — no window operator anywhere in
    the plan (pinned by tests/test_scale_paths.py).

    Returns (rank, doc_id, score).
    """
    scores = bm25_scores(df, query_terms, text_col, id_col)
    # eager k-row checkpoint: the rank join reads `top` on both sides; a
    # lazy frame would recompute the whole scoring pipeline twice
    top = (
        scores.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
        .localCheckpoint(eager=True)
    )
    better = (F.col("b.score") > F.col("a.score")) | (
        (F.col("b.score") == F.col("a.score")) & (F.col("b.doc_id") < F.col("a.doc_id"))
    )
    return (
        top.alias("a")
        .join(F.broadcast(top.alias("b")), better, "left")
        .groupBy(F.col("a.doc_id").alias("doc_id"), F.col("a.score").alias("score"))
        .agg((F.count(F.col("b.doc_id")) + 1).cast("int").alias("rank"))
        .select("rank", "doc_id", "score")
    )
