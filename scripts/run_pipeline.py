#!/usr/bin/env python
"""spark-submit entry for the extraction pipeline (north_rule deployment
surface).

Cluster:
    spark-submit --py-files samu_ocr_extraction_poc_spark.zip \
        scripts/run_pipeline.py --input <iceberg-table-or-parquet-path> \
        --output /warehouse/extraction --run-id nightly-01 --n-parts 4096

Local smoke:
    python scripts/run_pipeline.py --input /tmp/corpus --output /tmp/out

Re-running with the same --output resumes: partitions whose lineage rows are
'done' are anti-joined away and their results left untouched.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents table (Iceberg name or parquet path)")
    ap.add_argument("--output", required=True, help="output dir (results/ + lineage/)")
    ap.add_argument("--run-id", default="run")
    ap.add_argument("--n-parts", type=int, default=256)
    ap.add_argument("--cores", type=int, default=None, help="local-mode cores (omit under a cluster manager)")
    ap.add_argument("--ocr-lookup", default=None, help="parquet path with (media_ref, text) OCR table")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from samu_ocr_extraction_poc_spark.plans.pipeline import run_resumable
    from samu_ocr_extraction_poc_spark.sources.readers import load_documents

    if args.cores:
        from samu_ocr_extraction_poc_spark.session import get_spark

        spark = get_spark("extraction-pipeline", cores=args.cores)
    else:  # under spark-submit the cluster manager owns the session config
        spark = SparkSession.builder.appName("extraction-pipeline").getOrCreate()

    docs = load_documents(spark, args.input)
    ocr = None
    if args.ocr_lookup:
        ocr = {
            r["media_ref"]: r["text"]
            for r in spark.read.parquet(args.ocr_lookup).collect()
        }
    results = run_resumable(
        spark, docs, args.output, run_id=args.run_id, n_parts=args.n_parts, ocr_lookup=ocr
    )
    lineage = spark.read.parquet(f"{args.output}/lineage")
    n = results.count()
    errs = lineage.groupBy().sum("n_errors").collect()[0][0] or 0
    print(f"extraction complete: {n} documents, {errs} error rows, output={args.output}")


if __name__ == "__main__":
    main()
