"""Deterministic distinct-count sketches (training-data pipeline ops,
SURVEY.md §2.12 family — beyond the reference's own surface).

Spark's built-in `approx_count_distinct` (HyperLogLog++) is the usual
answer at 100 TB, but its estimates are engine-specific — useless under a
cross-engine exact-parity gate. The KMV (k-minimum-values) sketch gives
the same bounded-memory scaling story with a fully deterministic result:
both engines hash tokens with md5, keep each group's k smallest 60-bit
hash values, and estimate D = (k-1) / u_k where u_k is the k-th minimum
normalized to [0,1) (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007).

Exactness contract: the k smallest hashes of a set are a pure function of
the set, so the estimate is bit-identical across engines, runs, and
partitionings — DuckDB replays it with the same md5 arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textfns import token_md5_long
from .corpus import _kgrams

# hash domain: token_md5_long keeps 15 hex chars = 60 bits
_HASH_DOMAIN = float(1 << 60)


def _group_sketch_sets(
    df: DataFrame,
    k: int,
    ngram: int,
    n_sub: int,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """(grp, h) rows: each group's k smallest distinct n-gram hashes —
    the KMV sketch SET (not just the k-th minimum), which is what makes
    the sketch mergeable (see kmv_group_overlap). Hierarchical exact
    min-k as described in kmv_distinct_tokens."""
    hashed = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(_kgrams(F.col(text_col), ngram)).alias("tok"),
        )
        .select("grp", token_md5_long(F.col("tok")).alias("h"))
        .distinct()
    )
    sub = hashed.withColumn("sub", F.col("h") % n_sub)
    w1 = Window.partitionBy("grp", "sub").orderBy("h")
    cand = (
        sub.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .drop("rn", "sub")
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    return (
        cand.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def bloom_build(
    df: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Distributed Bloom filter BUILD over a key column: the bounded-
    memory membership structure an ingest pipeline probes BEFORE paying
    for the full dedup index (classic Bloom 1970; k md5-derived bit
    positions per key). Stored as (word_idx, bits) rows of 32-bit words
    packed in BIGINT — 32 rather than 64 bits per word so ``1 << bit``
    stays positive in both engines (no signed-overflow games), and rows
    rather than one blob so the build is ONE partial-aggregable
    groupBy/bit_or and the filter itself stays mergeable (union = bit_or
    again) and distributable. ~m_bits/32 rows regardless of corpus size.

    Determinism contract (the package's KMV argument): bit positions are
    pure md5 arithmetic, so build and probe — including FALSE-POSITIVE
    behavior — replay bit-identically on DuckDB.
    """
    pos = [
        token_md5_long(F.col(key_col), prefix=f"bloom{j}:") % F.lit(m_bits)
        for j in range(k)
    ]
    stacked = df.select(
        F.explode(F.array(*[p.cast("bigint") for p in pos])).alias("h")
    )
    return (
        stacked.select(
            (F.col("h") / 32).cast("bigint").alias("word_idx"),
            # F.shiftleft takes a literal bit count; the per-row shift
            # needs the SQL form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 32 AS INT))").alias("b"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(b)").cast("bigint").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    batch: DataFrame,
    key_col: str = "key",
    id_col: str = "doc_id",
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Probe a :func:`bloom_build` filter: an element is a (probable)
    member iff ALL k of its bit positions are set. One equi-join of the
    batch's k position rows against the word table (the filter side is
    tiny — broadcastable at any corpus size since it is bounded by
    m_bits/32 rows) + one count-the-hits aggregate. Returns
    (doc_id, is_member 0/1) — is_member=1 means "probably in the corpus"
    (false positives possible at the standard Bloom rate, deterministic
    here; false negatives impossible).
    """
    pos = [
        token_md5_long(F.col(key_col), prefix=f"bloom{j}:") % F.lit(m_bits)
        for j in range(k)
    ]
    probes = batch.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(*[p.cast("bigint") for p in pos])).alias("h"),
    ).select(
        "doc_id",
        (F.col("h") / 32).cast("bigint").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 32 AS INT))").alias("b"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "doc_id",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("b")) == F.col("b")),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("doc_id")
        .agg(F.sum("hit").alias("n_hits"))
    )
    return hits.select(
        "doc_id",
        F.when(F.col("n_hits") == k, 1).otherwise(0).cast("int").alias("is_member"),
    )


def kmv_distinct_tokens(
    df: DataFrame,
    k: int = 64,
    ngram: int = 2,
    n_sub: int = 64,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group distinct word-``ngram`` count estimate via a KMV sketch
    (n-grams of the normalized text — the vocabulary unit whose distinct
    count actually explodes at corpus scale).

    Scale path: the k smallest hashes per group are found hierarchically —
    a first row_number window over (group, hash % n_sub) sub-buckets keeps
    k candidates per sub-bucket (each sub-bucket partition holds ~1/n_sub
    of the group's distinct hashes, so no partition is group-sized), then
    a second window over the <= k*n_sub surviving rows per group takes the
    true k minima. Both steps are exact: the k smallest overall are always
    among each sub-bucket's k smallest. No single-partition window at any
    corpus size (raise n_sub for bigger groups).

    Groups with fewer than k distinct n-grams get their exact count.
    Returns (group_col, n_mins, distinct_est) — n_mins = min(k, exact D).
    """
    mink = _group_sketch_sets(df, k, ngram, n_sub, group_col, text_col)
    est = mink.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_mins"), F.max("h").alias("kth")
    )
    return est.select(
        F.col("grp").alias(group_col),
        "n_mins",
        F.when(F.col("n_mins") < k, F.col("n_mins").cast("double"))
        .otherwise(
            F.round(F.lit(float(k - 1)) * F.lit(_HASH_DOMAIN) / F.col("kth"), 2)
        )
        .alias("distinct_est"),
    )


def kmv_group_overlap(
    df: DataFrame,
    k: int = 64,
    ngram: int = 2,
    n_sub: int = 64,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise group overlap from MERGED KMV sketches — the property that
    makes a sketch worth having at 100 TB: each group's k-minimum set is
    computed ONCE from its own data, and any pair's union/Jaccard estimate
    then comes from the two k-row sketches alone, never re-reading the
    corpus (Beyer et al., SIGMOD 2007: kmin_k(A∪B) ⊆ kmin_k(A) ∪
    kmin_k(B), so the merge is exact on sketch data).

    For each group pair a < b: K = the k smallest of the two sketch sets'
    union (k' = |K| when fewer), intersection fraction
    |{h ∈ K : h ∈ sketch(A) ∩ sketch(B)}| / k' estimates Jaccard, and
    the k'-th minimum of the union estimates |A ∪ B| exactly as in
    kmv_distinct_tokens. Everything after the per-group sketch is
    O(#pairs · k) — window partitions are ≤ 2k rows by construction.

    Returns (lang_a, lang_b, k_used, jaccard_est, union_est).
    """
    mins = _group_sketch_sets(df, k, ngram, n_sub, group_col, text_col).persist()
    # eager materialization (the lsh_candidate_pairs convention): six plan
    # branches read `mins`; a lazy persist lets them race to fill the cache
    # and recompute the sketch pipeline
    mins.count()
    groups = mins.select(F.col("grp").alias("ga")).distinct()
    pairs = (
        groups.join(mins.select(F.col("grp").alias("gb")).distinct())
        .where(F.col("ga") < F.col("gb"))
    )
    pu = (
        pairs.join(mins.withColumnRenamed("grp", "ga"), "ga")
        .select("ga", "gb", "h")
        .union(
            pairs.join(mins.withColumnRenamed("grp", "gb"), "gb")
            .select("ga", "gb", "h")
        )
        .dropDuplicates(["ga", "gb", "h"])
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    ku = pu.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    ina = mins.select(F.col("grp").alias("ga"), "h", F.lit(1).alias("in_a"))
    inb = mins.select(F.col("grp").alias("gb"), "h", F.lit(1).alias("in_b"))
    j = ku.join(ina, ["ga", "h"], "left").join(inb, ["gb", "h"], "left")
    out = (
        j.groupBy("ga", "gb")
        .agg(
            F.count("*").cast("bigint").alias("k_used"),
            F.sum(
                F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1)
                .otherwise(0)
            ).alias("n_both"),
            F.max("h").alias("kth"),
        )
        .select(
            F.col("ga").alias("lang_a"),
            F.col("gb").alias("lang_b"),
            "k_used",
            F.round(F.col("n_both") / F.col("k_used"), 4).alias("jaccard_est"),
            F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
            .otherwise(
                F.round(
                    (F.col("k_used") - 1).cast("double")
                    * F.lit(_HASH_DOMAIN)
                    / F.col("kth"),
                    2,
                )
            )
            .alias("union_est"),
        )
        .localCheckpoint(eager=True)
    )
    mins.unpersist()
    return out
