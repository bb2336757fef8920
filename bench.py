#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the BASELINE.json one — spatial-join rows/sec (H3-style
candidate join + exact PIP refine) — reported alongside per-query wall times.
Run scripts/scaling_proof.py for the two-parallelism-level efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session():
    from geojson_utility_spark.session import get_spark

    return get_spark(app_name="bench", master=f"local[{CPUS}]",
                     shuffle_partitions=int(CPUS))


def bench_queries(spark):
    """name -> (callable producing a DataFrame, action) — timed via count()."""
    from pyspark.sql import functions as F

    from geojson_utility_spark import fixtures as FX
    from geojson_utility_spark.entry_queries import (
        PTS_CUSTOMER,
        SHARED_SQL,
        WINDOW_RUNNING_SUM_SQL,
        register_views,
    )
    from geojson_utility_spark.operators.dedup import minhash_near_dups, simhash64
    from geojson_utility_spark.operators.knn import knn_join
    from geojson_utility_spark.operators.similarity import cosine_topk
    from geojson_utility_spark.operators.spatial_join import spatial_join
    from geojson_utility_spark.operators.textops import lang_id, quality_features

    register_views(spark, SF_DIR)
    n_points = 400_000
    ids = [f"img_{i:012d}" for i in range(n_points)]
    pts_pdf = FX.image_point(ids)
    polys_pdf = FX.make_polygons(120)[["polygon_id", "geojson"]]
    # stage the point table as parquet — the realistic source (distributed scan with
    # column pruning), not a driver-local pandas payload re-shipped per stage
    pts_path = "/tmp/bench_points.parquet"
    spark.createDataFrame(pts_pdf).withColumnRenamed("image_id", "point_id").write.mode(
        "overwrite"
    ).parquet(pts_path)

    def flagship():
        pts = spark.read.parquet(pts_path)
        polys = spark.createDataFrame(polys_pdf)
        # compact cover with min_zoom=14: interior cells stay coarse (3 probe
        # levels via bit-shift ancestors), boundary band at z16 — ~4x smaller
        # broadcast than the flat z16 cover, wall-time parity warm (ABAB sweep in
        # BENCH.md), identical matches; the smaller broadcast wins the tie at high
        # executor counts where ship time matters
        return spatial_join(pts, polys, zoom=16, compact=True, min_zoom=14)

    def knn():
        # filter, NOT limit: a global LIMIT coalesces to one partition and
        # serializes the whole downstream join
        pts = spark.read.parquet(pts_path).filter(
            F.col("point_id") < "img_000000100000"
        )
        tgt = spark.createDataFrame(
            FX.make_polygons(120)[["polygon_id", "centroid_lat", "centroid_lon"]].rename(
                columns={"polygon_id": "target_id", "centroid_lat": "lat",
                         "centroid_lon": "lon"}
            )
        )
        return knn_join(pts, tgt, k=3, zoom=9)

    def minhash():
        return minhash_near_dups(spark.table("documents"), "text", "doc_id", 0.5)

    def simhash():
        return simhash64(spark.table("documents"), "text", "doc_id")

    def quality():
        return quality_features(spark.table("documents"), "text").select(
            "doc_id", "quality_score", lang_id(F.col("text")).alias("lang_pred")
        )

    def ann():
        emb = spark.table("embeddings")
        q = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return cosine_topk(emb, q, k=10)

    out = {
        "flagship_spatial_join": flagship,
        "q1_pricing_rollup": lambda: spark.sql(SHARED_SQL["q1_pricing_rollup"]),
        "q3_shipping_priority": lambda: spark.sql(SHARED_SQL["q3_shipping_priority"]),
        "q5_region_volume": lambda: spark.sql(SHARED_SQL["q5_region_volume"]),
        "window_running_sum": lambda: spark.sql(WINDOW_RUNNING_SUM_SQL),
        "knn_grid": knn,
        "minhash_near_dups": minhash,
        "simhash": simhash,
        "text_quality_langid": quality,
        "embedding_topk": ann,
    }
    return out, n_points


def main():
    spark = build_session()
    qs, n_points = bench_queries(spark)
    # untimed warmup: JVM/JIT, whole-stage-codegen compilation, Arrow codepaths,
    # page cache — the timed loop measures steady-state query cost, not first-query
    # startup.  The minhash/simhash plans carry 32-96 generated aggregate columns
    # whose janino compile alone costs ~5 s; warming them on a 300-doc slice
    # compiles the identical generated classes so the timed run measures the query.
    from geojson_utility_spark.operators.dedup import (
        minhash_near_dups as _mh,
        simhash64 as _sh,
    )

    qs["flagship_spatial_join"]().limit(1000).count()
    qs["q1_pricing_rollup"]().count()
    _docs_warm = spark.table("documents").limit(300)
    _mh(_docs_warm, "text", "doc_id", 0.5).count()
    _sh(_docs_warm, "text", "doc_id").count()
    # host-noise normalizer: the SHARED pure-CPU probe (whole-stage-codegen
    # arithmetic over spark.range — zero I/O, zero engine code), same best-of-2
    # rule.  The sandbox VM has multi-hour phases where EVERYTHING runs ~1.8x
    # slower; cross-round comparisons should use query_time / cpu_probe ratios,
    # not absolute seconds.  One kernel definition for every record:
    # geojson_utility_spark/hostprobe.py.
    from geojson_utility_spark.hostprobe import cpu_probe_best

    probe_best = cpu_probe_best(spark, int(CPUS))

    times: dict[str, float] = {}
    join_rows = 0
    for name, fn in qs.items():
        # best-of-2: the host VM shows +/-25% ambient noise between runs; the min
        # of two back-to-back executions is the steady-state cost of the query
        # (standard benchmarking practice, both runs build the full plan fresh)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn()
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            if name == "flagship_spatial_join":
                join_rows = n
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    flagship_rps = round(n_points / times["flagship_spatial_join"], 1)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "spatial_join_rows_per_sec": flagship_rps,
                "flagship_input_points": n_points,
                "flagship_matches": join_rows,
                "cpu_probe_sec": round(probe_best, 3),
                # host-noise-normalized headline: total / cpu_probe — the number
                # to compare across rounds (the VM has multi-hour ~1.8x slow
                # phases that scale probe and queries together)
                "value_normalized": round(total / probe_best, 3),
                "sf": SF_DIR,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
