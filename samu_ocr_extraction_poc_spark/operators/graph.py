"""Link-graph analytics for crawl-derived corpora.

Web-scale training corpora weight and seed their crawls with link-graph
centrality (CCNet / Gopher-style quality signals rank hosts by a
PageRank-family score before content filters run).  The reference engine
has no graph operator — connected components (operators/dedup.py) covers
its dedup clustering — so this module is part of the additive
LLM-data-pipeline suite: a deterministic synthetic link graph over the
document id space plus an all-integer PageRank whose fixed-point
arithmetic replays exactly in DuckDB (the kmeans/CC "unrolled
iterations" oracle precedent, contract.py:_kmeans_sql / CC_SQL).

Scale notes (100 TB / 10^11-edge graph):
- Edge synthesis is one narrow projection + explode(k) over the node
  table, then a semi join against the node list to keep the graph
  well-formed — no self-join, no collect.
- Each PageRank iteration is the canonical two-shuffle plan: ranks
  (|V| rows, 2 columns) join out-degrees on node, the big edge table
  joins that share table on src, and one partially-aggregable
  groupBy(dst) sum. The edge table is the only large operand; it is
  re-read per iteration but never widened. Lineage is truncated with
  localCheckpoint every ``checkpoint_every`` iterations (operators/
  bpe.py precedent) so a 50-iteration run does not accumulate a
  50-join plan.
- All mass arithmetic is BIGINT fixed-point (scale 10^12): rank mass
  is bounded by the scale, so 85 * rank < 8.5e13 never approaches the
  BIGINT range, and the integer division order (share first, damping
  second) is pinned and replayed verbatim by the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .corpus import _md5_bucket

PR_SCALE = 10**12


def synth_link_graph(
    nodes: DataFrame,
    id_col: str = "doc_id",
    n_links: int = 3,
    salt: str = "pr",
) -> DataFrame:
    """Deterministic synthetic link graph over an id space: node u emits
    ``n_links`` directed edges whose targets are md5-uniform draws from
    the 0..N-1 index space (N = |nodes|, one bounded count collected
    driver-side). Targets that miss the actual id set (non-contiguous
    ids) and self-loops are dropped, multi-edges collapse — both engines
    apply the same rules, so the graph is exact cross-engine.

    Returns (src, dst) BIGINT edges.
    """
    n = nodes.select(id_col).distinct().count()
    ids = nodes.select(F.col(id_col).cast("bigint").alias("src")).distinct()
    raw = ids.select(
        "src", F.explode(F.sequence(F.lit(1), F.lit(n_links))).alias("j")
    ).select(
        "src",
        _md5_bucket(
            F.concat(F.lit(f"{salt}:"), F.col("src").cast("string"), F.lit(":"), F.col("j").cast("string")),
            15,
            n,
        ).alias("dst"),
    )
    node_set = ids.select(F.col("src").alias("dst"))
    return (
        raw.where(F.col("src") != F.col("dst"))
        .join(node_set, "dst", "left_semi")
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    checkpoint_every: int = 16,
) -> DataFrame:
    """All-integer fixed-point PageRank (Page et al. 1999; damping as the
    integer percentage ``damping_pct``).

    Per node v each iteration::

        share(u)  = rank(u) DIV out_deg(u)                 (u with out-edges)
        rank'(v)  = ((100-d) * (scale DIV N)) DIV 100
                  + (d * sum_{u->v} share(u)) DIV 100

    Every operation is BIGINT; integer-division truncation and dangling /
    dropped-target mass leaks are part of the pinned semantics (both
    deterministic), so the DuckDB oracle unrolling the same ``iterations``
    reproduces the ranks bit-exactly — no FP convergence tolerance exists
    anywhere. ``iterations`` is a fixed hyperparameter, not a convergence
    loop: at damping 0.85 eight rounds contract the rank residual by
    0.85^8 ≈ 0.27, the standard "fixed-sweep" operating point for
    quality-weighting (exactness across engines is what the gate checks;
    more sweeps are a parameter, not a code path).

    Returns (node, rank) with rank in scale units; join degrees back in
    the caller if wanted.
    """
    n = nodes.select(id_col).distinct().count()
    teleport = ((100 - damping_pct) * (scale // n)) // 100
    node_t = nodes.select(F.col(id_col).cast("bigint").alias("node")).distinct()
    # All joins below are name-based using-joins on freshly-aliased
    # columns: from iteration 2 the ranks lineage contains the edge
    # table, and dataframe-attribute references (df["col"]) trip Spark's
    # ambiguous-self-join detection.
    out_deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("out_deg"))
        .withColumnRenamed("src", "node")
    )
    # `pr`, not `rank`, internally: `rank` is a window-function keyword
    # inside F.expr and must not shadow the column reference.
    ranks = node_t.select("node", F.lit(scale // n).cast("bigint").alias("pr"))
    for it in range(1, iterations + 1):
        shares = ranks.join(out_deg, "node").select(
            F.col("node").alias("src"), F.expr("pr DIV out_deg").alias("share")
        )
        contrib = (
            edges.join(shares, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
            .withColumnRenamed("dst", "node")
        )
        ranks = node_t.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport).cast("bigint")
                + F.expr(f"({damping_pct} * coalesce(c, 0)) DIV 100")
            ).alias("pr"),
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("pr").alias("rank"))
