#!/usr/bin/env python
"""ABAB measurement: shingle_store='persist' (A) vs 'bucketed' (B) at 1M docs
(VERDICT r5 task 2).  Same corpus + probe-bracket methodology as
neardup_scale_bench.py; each measurement prints one JSON line.  The executed
plan of each B run is dumped to /tmp/bucketed_plan_<op>.txt so the b-side
exchange claim is checkable (look for the bucketed FileScan feeding the second
SortMergeJoin with no Exchange/Sort between).

Run: python scripts/bucketed_abab.py [ops] [rounds]   ops e.g. "ngram,minhash"
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    ops = (sys.argv[1] if len(sys.argv) > 1 else "ngram,minhash").split(",")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_docs = int(os.environ.get("ABAB_DOCS", "1000000"))
    from pyspark.sql import functions as F

    from geojson_utility_spark.hostprobe import cpu_probe_best
    from geojson_utility_spark.operators.dedup import (
        cleanup_shingle_tables,
        minhash_near_dups,
        ngram_jaccard_pairs_exact,
    )
    from geojson_utility_spark.session import get_spark

    # ABAB_SHUFFLE: shuffle partitions (default = cores).  The 10M-doc probe
    # raises it (e.g. 256) the way a real cluster would size partitions to fit
    # executor memory — the shuffle_hash build-map contract (dedup.py).
    nshuf = int(os.environ.get("ABAB_SHUFFLE", CPUS))
    spark = get_spark(app_name="bucketed_abab", master=f"local[{CPUS}]",
                      shuffle_partitions=nshuf)
    half = n_docs // 2
    docs = spark.range(0, n_docs, 1, int(CPUS) * 4).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.md5(F.pmod(F.col("id"), half).cast("string")),
            F.md5((F.pmod(F.col("id"), half) * 3 + 1).cast("string")),
            F.md5((F.pmod(F.col("id"), half) * 7 + 2).cast("string")),
            F.md5((F.pmod(F.col("id"), half) * 13 + 3).cast("string")),
            F.when(F.col("id") < half, F.lit(" alpha")).otherwise(F.lit(" beta")),
        ).alias("text"),
    ).localCheckpoint()

    def run(op: str, store: str):
        spark.catalog.clearCache()
        cleanup_shingle_tables(spark)
        fn = ngram_jaccard_pairs_exact if op == "ngram" else minhash_near_dups
        p0 = round(cpu_probe_best(spark, int(CPUS)), 3)
        t0 = time.perf_counter()
        out = fn(docs, "text", "doc_id", threshold=0.8,
                 storage_level="DISK_ONLY", shingle_store=store)
        n = out.count()
        dt = time.perf_counter() - t0
        if store == "bucketed":
            with open(f"/tmp/bucketed_plan_{op}.txt", "w") as f:
                f.write(out._jdf.queryExecution().executedPlan().toString())
        print(json.dumps({
            "op": op, "store": store, "n_docs": n_docs, "pairs": n,
            "sec": round(dt, 2), "probe_before": p0,
            "probe_after": round(cpu_probe_best(spark, int(CPUS)), 3),
        }), flush=True)

    for op in ops:
        for _ in range(rounds):
            run(op, "persist")
            run(op, "bucketed")
    cleanup_shingle_tables(spark)
    spark.stop()


if __name__ == "__main__":
    main()
