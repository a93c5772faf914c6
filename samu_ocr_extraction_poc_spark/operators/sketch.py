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
    mink = cand.withColumn("rn", F.row_number().over(w2)).where(F.col("rn") <= k)
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
