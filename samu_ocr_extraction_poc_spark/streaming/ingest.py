"""Structured Streaming surface.

The reference is event-driven (S3 event -> SNS -> Lambda chain,
lib/medical-extractor/stack.ts:225-249) but performs no streaming
*computation* — each document is processed exactly once (SURVEY.md §2.11).
The streaming analog of that architecture in Spark:

- :func:`stream_extract` — continuous ingest of newly-arrived document
  files; each micro-batch runs the SAME batch extraction stage via
  ``foreachBatch`` and appends results + lineage (exactly-once per file via
  checkpointed source offsets). This replaces the SNS fan-out: routing is a
  column, not a topic.
- :func:`stream_event_metrics` — watermarked tumbling-window counts over an
  event stream (late data handled by the watermark), the streaming
  formulation of contract.events_hourly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import DOCUMENTS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    ocr_lookup: dict[str, str] | None = None,
    n_parts: int = 8,
):
    """readStream over a documents directory -> per-micro-batch extraction
    -> append sink. Returns the StreamingQuery (caller stops it)."""
    from ..plans.pipeline import lineage_from_results, run_extraction

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        results = run_extraction(
            batch_df, ocr_lookup=ocr_lookup, n_parts=n_parts, repartition=True
        )
        results.persist()
        results.write.mode("append").partitionBy("part_id").parquet(f"{out_dir}/results")
        lineage_from_results(results, run_id=f"epoch-{epoch_id}").write.mode(
            "append"
        ).parquet(f"{out_dir}/lineage")
        results.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_user_totals(
    spark: SparkSession,
    input_dir: str,
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    cumulative per-user event count + value sum, state carried across
    micro-batches (and restarts, via the sink checkpoint).

    Returns the streaming DataFrame; start it with writeStream (tests use
    update-mode memory sink + availableNow)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    events = spark.readStream.schema(schema).parquet(input_dir)

    def _update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "1 hour",
    ts_col: str = "ingest_ts",
):
    """Streaming exact dedup for a continuously-arriving corpus: md5 the
    normalized text, then ``dropDuplicatesWithinWatermark`` on the hash so
    the dedup state is actually BOUNDED — plain ``dropDuplicates(subset)``
    without the event-time column in the subset keeps every key forever
    (Spark only evicts dropDuplicates state when event time is part of the
    key, which is exactly why dropDuplicatesWithinWatermark exists). At
    10^12 docs unbounded dedup state is the failure mode. First occurrence
    within the watermark horizon wins, matching the batch keep-first
    semantics (operators/dedup.py); a duplicate arriving more than
    ``watermark`` after its original is re-admitted — the deliberate
    state-size/recall trade.

    Returns the streaming DataFrame of surviving (deduped) documents;
    start it with writeStream (tests use append memory sink + availableNow).
    """
    from ..functions.textfns import normalized

    schema = (
        "doc_id long, text string, lang string, source string, n_chars long, "
        f"{ts_col} timestamp"
    )
    docs = spark.readStream.schema(schema).parquet(input_dir)
    return (
        docs.withColumn("text_hash", F.md5(normalized(F.col("text"))))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def stream_near_dedup(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "1 hour",
    ts_col: str = "ingest_ts",
    num_hashes: int = 8,
):
    """Streaming NEAR-dup dedup: the minhash signature (operators/dedup.py
    family, computed row-locally via row_minhash — no aggregation state,
    which is what makes it legal upstream of a stateful dedup) is the
    dedup key for ``dropDuplicatesWithinWatermark``. Documents whose full
    num_hashes-signature collides within the watermark horizon collapse to
    the first arrival — the streaming analog of the batch pairs->clusters
    pipeline at its highest-precision point (a full-signature match is the
    strictest LSH band). State is bounded by the watermark, same
    state-size/recall trade as stream_exact_dedup.

    Returns the streaming DataFrame of surviving documents.
    """
    from ..operators.dedup import row_minhash

    schema = (
        "doc_id long, text string, lang string, source string, n_chars long, "
        f"{ts_col} timestamp"
    )
    docs = spark.readStream.schema(schema).parquet(input_dir)
    sig_cols = row_minhash(F.col("text"), num_hashes=num_hashes)
    return (
        docs.select("*", *sig_cols)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([f"h{i}" for i in range(num_hashes)])
        .drop(*[f"h{i}" for i in range(num_hashes)])
    )


def stream_event_metrics(
    spark: SparkSession,
    events: DataFrame | None = None,
    input_dir: str | None = None,
    window: str = "1 hour",
    watermark: str = "30 minutes",
):
    """Watermarked tumbling-window aggregation over an event stream.

    Pass ``input_dir`` for a real file stream; the returned DataFrame is a
    streaming frame to be started with ``writeStream`` (tests use the memory
    sink + availableNow trigger).
    """
    if events is None:
        if input_dir is None:
            raise ValueError("need events or input_dir")
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        events = spark.readStream.schema(schema).parquet(input_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    min_quality: float = 0.4,
):
    """Stateless streaming curation stage: score each arriving document
    with the composite quality gate and scrub PII, keeping survivors —
    quality_score and redact_pii are pure Column expressions, so this
    stage carries NO state (unlike the dedup stages it composes with) and
    backpressures only on the scan. The standard ingest order is
    curate (stateless) -> near-dup dedup (watermark-bounded state): cheap
    narrow filtering first shrinks what the stateful stage must remember.

    Returns the streaming DataFrame (doc_id, lang, source, quality,
    clean_text); start it with writeStream.
    """
    from ..functions.textfns import quality_score, redact_pii

    schema = (
        "doc_id long, text string, lang string, source string, n_chars long, "
        "ingest_ts timestamp"
    )
    docs = spark.readStream.schema(schema).parquet(input_dir)
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            "ingest_ts",
            quality_score(F.col("text")).alias("quality"),
            redact_pii(F.col("text")).alias("clean_text"),
        )
        .where(F.col("quality") >= min_quality)
    )


def stream_probe_dedup(
    spark: SparkSession,
    input_dir: str,
    corpus: DataFrame | None = None,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    band_index: DataFrame | None = None,
    return_index: bool = False,
    index_location: str | None = None,
    k: int = 3,
):
    """Streaming INCREMENTAL dedup against an already-indexed corpus (the
    streaming form of operators/dedup.lsh_probe_dedup): each arriving
    document's minhash band keys are computed ROW-LOCALLY (row_minhash —
    no aggregation state), then the stream is anti-joined against the
    static corpus band index once per band. A document survives iff NO
    band key collides with any indexed document — exists-any-collision
    expressed as ``n_bands`` chained stream-static left_anti equality
    joins (supported by Structured Streaming; a per-doc hit-count
    aggregation would need a watermarked stateful agg for the same
    verdict).

    Pass ``index_location`` (a ``build_band_index`` table) to probe a
    persisted index — the PREFERRED production path: the read is
    META-VALIDATED against this query's num_hashes/rows_per_band, so a
    parameter-mismatched index raises instead of silently never
    colliding (every duplicate waved through as "new"); the per-band
    ``band_id = b`` filters prune the scan to one directory partition
    each, and the table's lifecycle is owned by its storage, not this
    query. ``band_index`` accepts an already-loaded frame instead — the
    caller then owns BOTH its lifecycle AND the parameter handshake
    (load it via ``load_band_index(spark, loc, num_hashes,
    rows_per_band, k)`` with ALL the explicit params, never bare). When only the
    raw ``corpus`` is given, its index is built ONCE here, persisted and
    eagerly materialized — otherwise every micro-batch would re-run the
    corpus shingle+minhash pipeline once per band anti-join. That
    persisted frame lives until explicitly released (ADVICE r3): call
    with ``return_index=True`` to receive it alongside the stream and
    ``unpersist()`` it deterministically when the query stops; otherwise
    it is freed only when the ContextCleaner collects it.

    Returns the streaming DataFrame of documents NOT already in the
    corpus (the ones an ingest pipeline forwards) — or a
    ``(stream, band_index)`` pair when ``return_index=True``.
    """
    from ..operators.dedup import (
        _banded,
        load_band_index,
        minhash_signatures,
        row_minhash,
    )

    n_bands = num_hashes // rows_per_band
    if index_location is not None:
        if band_index is not None:
            raise ValueError("pass index_location or band_index, not both")
        # validate ALL THREE signature-family params, including the
        # shingle size k — it changes the key space just as much as the
        # hash family (review r4 pass 3)
        band_index = load_band_index(
            spark,
            index_location,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
            k=k,
        )
    if band_index is None:
        if corpus is None:
            raise ValueError("pass corpus, band_index, or index_location")
        band_index = _banded(
            minhash_signatures(corpus, num_hashes=num_hashes, k=k),
            num_hashes,
            rows_per_band,
        ).persist()
        band_index.count()
    idx = band_index
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.readStream.schema(schema).parquet(input_dir)
    sig_cols = row_minhash(F.col("text"), num_hashes=num_hashes, k=k)
    out = docs.select("*", *sig_cols)
    for b in range(n_bands):
        key = F.concat_ws(
            "_", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        band_idx = idx.where(F.col("band_id") == b).select(
            F.col("band_key").alias(f"__bk{b}")
        )
        out = out.withColumn(f"__k{b}", key).join(
            band_idx, F.col(f"__k{b}") == F.col(f"__bk{b}"), "left_anti"
        )
    out = out.drop(
        *[f"h{i}" for i in range(num_hashes)], *[f"__k{b}" for b in range(n_bands)]
    )
    return (out, idx) if return_index else out


def latest_hll_state(spark: SparkSession, state_dir: str):
    """The current committed sketch of a :func:`stream_hll` run: the
    highest ``v=<n>`` sub-directory carrying Spark's _SUCCESS marker
    (a version without the marker is a crashed half-write and is
    ignored). Returns (DataFrame, version) or (None, -1) when no
    committed state exists. Driver-side os.listdir — state lives on the
    driver-visible filesystem here; a cluster deployment swaps these few
    lines for the Hadoop FileSystem API, nothing else changes."""
    import os

    best = -1
    if os.path.isdir(state_dir):
        for name in os.listdir(state_dir):
            if name.startswith("v="):
                try:
                    v = int(name[2:])
                except ValueError:
                    continue
                if v > best and os.path.exists(
                    os.path.join(state_dir, name, "_SUCCESS")
                ):
                    best = max(best, v)
    if best < 0:
        return None, -1
    return spark.read.parquet(f"{state_dir}/v={best}"), best


def stream_hll(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    p: int = 8,
    w_bits: int = 32,
):
    """Streaming HLL maintenance: a continuously-updated distinct-count
    sketch over the arriving corpus's word bigrams (vocabulary growth is
    THE live signal a crawl-ingest dashboard wants, and the exact answer
    needs unbounded state). Each micro-batch builds its OWN register
    table (operators/sketch.py:hll_build — one partial-aggregable
    groupBy/max) and merges it into the persisted sketch via foreachBatch;
    the merged <= 2^p + 2 rows are collected (the bounded collect-once
    discipline) and written as a NEW VERSION ``v=<batch_id>`` whose
    _SUCCESS marker is the commit point — an in-place overwrite deletes
    the old state before the new one exists, so a crash mid-write would
    silently reset the sketch to the replayed batch alone (r5 review
    finding); with versions, a torn write leaves no marker and the
    previous committed version keeps serving.

    The delivery-semantics argument: hll_merge is per-bucket MAX —
    associative, commutative, and IDEMPOTENT — so replaying a micro-batch
    after a crash leaves the sketch bit-identical (the replayed batch
    rewrites ITS OWN version number). At-least-once delivery is
    therefore SUFFICIENT; no transactional sink or dedup ledger is
    needed, which is exactly why register sketches (not exact counters)
    are the streaming-metrics structure at 10^12 docs. Tests pin
    stream-final registers == the one-shot batch build, and replay
    no-ops.

    Returns the streaming query (availableNow in tests); read the
    current sketch with :func:`latest_hll_state` (hll_estimate consumes
    it directly — meta rows are carried through the state).
    """
    from ..operators.corpus import _kgrams
    from ..operators.sketch import hll_build, hll_merge

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.readStream.schema(schema).parquet(input_dir)

    def update(batch: DataFrame, batch_id: int) -> None:
        items = batch.select(F.explode(_kgrams(F.col("text"), 2)).alias("tok"))
        breg = hll_build(items, "tok", p=p, w_bits=w_bits)
        sess = batch.sparkSession
        state, _v = latest_hll_state(sess, state_dir)
        merged = (
            hll_merge(state, breg, p=p, w_bits=w_bits) if state is not None else breg
        )
        # bounded collect (<= 2^p register rows + 2 meta rows); the write
        # targets this batch's own version dir, so a replayed batch
        # overwrites only itself and the _SUCCESS marker commits it
        rows = [(int(r["bucket"]), int(r["r"])) for r in merged.collect()]
        sess.createDataFrame(rows, "bucket bigint, r bigint").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/v={batch_id}")

    return (
        docs.writeStream.foreachBatch(update)
        .trigger(availableNow=True)
        .option("checkpointLocation", state_dir + "_ckpt")
        .start()
    )
