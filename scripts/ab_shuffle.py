#!/usr/bin/env python
"""Shuffle-path scaling A/B (VERDICT r4 item 4).

BENCH_r04 recorded the shuffle job at raw efficiency 0.729 best vs the
north-rule >=0.8 bar (the narrow extraction job meets it: 0.908 raw /
1.0 ceiling-normalized). This script isolates WHY, mechanically:

  A. shuffle-partition policy at both parallelism levels
     (cores*2 current, cores*4, fixed 64) — is the gap a partitioning
     artifact?
  B. AQE coalescing on vs off — is runtime re-plan hurting the small
     shuffle?
  C. a PURE-JVM compute ceiling job (md5 over range, partial-agg only,
     no Python workers, negligible exchange) at the same two levels —
     the JVM analog of bench.py's Python busy-loop ceiling. If THIS
     lands at ~0.73-0.83, the host's per-core throughput decline with
     active-thread count (turbo/SMT/memory bandwidth) binds the shuffle
     job too, and no Spark knob can buy it back on one box.

Same interleaved lo/hi round structure as bench.py so a load burst hits
both sides of a round. Output: one JSON block per config, printed and
appended to stdout for BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samu_ocr_extraction_poc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "48"))
LO, HI = 4, 16
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))


# The A/B measures THE bench shuffle job itself (not a copy): importing it
# keeps this table synchronized with the job whose scaling number it explains.
from bench import _dedup_shuffle_job as _shuffle_job  # noqa: E402


def _jvm_ceiling_job(spark, _corpus_dir: str) -> int:
    """Pure whole-stage-codegen CPU: md5 over a range, one partial agg.
    No Python workers, no meaningful exchange — measures how the JVM
    itself scales 4 -> 16 active cores on this host."""
    n = 6_000_000
    spark.range(n, numPartitions=64).selectExpr(
        "sum(length(md5(concat('x', cast(id as string))))) as s"
    ).collect()
    return n


def _run_config(tag: str, corpus_dir: str, job, shuffle_of, extra_conf) -> dict:
    rounds = []
    best: dict[int, float] = {}
    for _ in range(ROUNDS):
        pair = {}
        for cores in (LO, HI):
            spark = get_spark(
                f"ab-{tag}-{cores}", cores=cores,
                shuffle_partitions=shuffle_of(cores),
                extra_conf=extra_conf,
            )
            job(spark, corpus_dir)  # warm: JIT + scan cache of metadata
            t0 = time.perf_counter()
            n = job(spark, corpus_dir)
            dt = time.perf_counter() - t0
            spark.stop()
            pair[cores] = (dt, n)
            if cores not in best or dt < best[cores]:
                best[cores] = dt
        rounds.append(
            round((pair[HI][1] / pair[HI][0]) / (pair[LO][1] / pair[LO][0]) / (HI / LO), 3)
        )
    out = {
        "config": tag,
        "rounds": rounds,
        "eff_best": max(rounds),
        f"local{LO}_sec": round(best[LO], 2),
        f"local{HI}_sec": round(best[HI], 2),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    corpus_dir = tempfile.mkdtemp(prefix="ab_corpus_")
    try:
        prep = get_spark("ab-prep", cores=16, shuffle_partitions=32)
        from bench import _materialize_corpus

        _materialize_corpus(prep, SF_DIR, REPLICATE, corpus_dir)
        prep.stop()

        results = []
        # C first: if the JVM ceiling binds, A/B are explanations, not fixes
        results.append(_run_config(
            "jvm_ceiling_md5_partialagg", corpus_dir, _jvm_ceiling_job,
            lambda c: c * 2, None))
        results.append(_run_config(
            "shuffle_parts_2x_aqe_on", corpus_dir, _shuffle_job,
            lambda c: c * 2, None))
        results.append(_run_config(
            "shuffle_parts_4x_aqe_on", corpus_dir, _shuffle_job,
            lambda c: c * 4, None))
        results.append(_run_config(
            "shuffle_parts_64_aqe_on", corpus_dir, _shuffle_job,
            lambda c: 64, None))
        results.append(_run_config(
            "shuffle_parts_2x_aqe_coalesce_off", corpus_dir, _shuffle_job,
            lambda c: c * 2,
            {"spark.sql.adaptive.coalescePartitions.enabled": "false"}))
        print("AB_RESULT " + json.dumps(results), flush=True)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
