#!/usr/bin/env python
"""Probe-normalized ABAB comparison of minhash_near_dups capped vs uncapped.

VERDICT r3 flagged the driver-visible minhash bench regression (2.284 s r2 ->
4.414 s r3) and demanded normalized evidence: interleave the capped
(bucket_cap=20_000, the production default) and uncapped (bucket_cap=None)
variants A/B/A/B..., divide each by the fixed pure-CPU probe measured next to
it, and report the steady-state ratio.  Run at sf0.1 (driver bench shape) and
optionally a larger corpus via SPARK_GRAFT_SF_DIR.

Usage: python scripts/minhash_abab.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def cpu_probe(spark):
    """The shared probe PLAN (geojson_utility_spark/hostprobe.py) — this script
    times single collects itself, so it returns the DataFrame, not a best-of."""
    from geojson_utility_spark.hostprobe import cpu_probe_df

    return cpu_probe_df(spark, int(CPUS))


def main():
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from geojson_utility_spark.operators.dedup import minhash_near_dups
    from geojson_utility_spark.session import get_spark

    spark = get_spark(app_name="minhash_abab", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # warmup: janino compile of the 32-min-agg plan + Arrow paths, small slice
    warm = docs.limit(300)
    minhash_near_dups(warm, "text", "doc_id", 0.5).count()
    minhash_near_dups(warm, "text", "doc_id", 0.5, bucket_cap=None).count()
    cpu_probe(spark).collect()

    results = []
    for rnd in range(n_rounds):
        for variant, cap in (("capped", 20_000), ("uncapped", None)):
            t0 = time.perf_counter()
            n = minhash_near_dups(docs, "text", "doc_id", 0.5,
                                  bucket_cap=cap).count()
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            cpu_probe(spark).collect()
            probe = time.perf_counter() - t0
            results.append({"round": rnd, "variant": variant, "sec": round(dt, 3),
                            "probe": round(probe, 3),
                            "norm": round(dt / probe, 3), "rows": n})
            print(json.dumps(results[-1]), flush=True)

    for variant in ("capped", "uncapped"):
        rs = [r for r in results if r["variant"] == variant]
        best = min(r["sec"] for r in rs)
        best_norm = min(r["norm"] for r in rs)
        print(json.dumps({"variant": variant, "best_sec": best,
                          "best_norm": best_norm,
                          "median_norm": sorted(r["norm"] for r in rs)[len(rs) // 2]}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
