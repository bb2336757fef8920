#!/usr/bin/env python
"""Per-query PROBE-NORMALIZED bench (r7, VERDICT r6 task 6).

Round-over-round comparison of raw seconds is polluted by the sandbox host's
multi-hour ~1.8x slow phases (BENCH.md).  ``bench.py`` is FROZEN for
measurement, so this SEPARATE file reuses its exact query set, warmup and
best-of-2 rule, then also emits ``queries_normalized`` = query_sec /
cpu_probe_sec (same SHARED kernel, ``hostprobe.cpu_probe_best``) — the
numbers to compare across rounds.  Usage and env contract identical to
bench.py ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS); prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the frozen harness: session, query set, warmup recipe

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    spark = bench.build_session()
    qs, n_points = bench.bench_queries(spark)

    from geojson_utility_spark.operators.dedup import (
        minhash_near_dups as _mh,
        simhash64 as _sh,
    )
    from geojson_utility_spark.hostprobe import cpu_probe_best

    qs["flagship_spatial_join"]().limit(1000).count()
    qs["q1_pricing_rollup"]().count()
    _docs_warm = spark.table("documents").limit(300)
    _mh(_docs_warm, "text", "doc_id", 0.5).count()
    _sh(_docs_warm, "text", "doc_id").count()
    probe_best = cpu_probe_best(spark, int(CPUS))

    times: dict[str, float] = {}
    for name, fn in qs.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn().count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_time_normalized",
                "value": total,
                "unit": "sec",
                "queries": times,
                "cpu_probe_sec": round(probe_best, 3),
                "queries_normalized": {
                    k: round(v / probe_best, 3) for k, v in times.items()
                },
                "value_normalized": round(total / probe_best, 3),
                "sf": SF_DIR,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
