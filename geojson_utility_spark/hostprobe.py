"""Shared host-noise CPU probe — the ONE definition every bench record uses.

The sandbox VM has multi-hour phases where everything runs ~1.8x slower;
probe-normalized ratios (query_time / probe_time) are the only comparable
cross-record numbers.  That works ONLY while every record uses the identical
kernel (row count, LCG rounds, partition multiplier, best-of-2 rule) — this
module replaces the previously hand-synced copies in bench.py and the
scripts.

The plan is REBUILT per collect: re-collecting one DataFrame object is served
from Spark 4's result cache and reads ~0.05 s regardless of host state.
"""

from __future__ import annotations

import time

_PROBE_ROWS = 2_000_000_000
_LCG_ROUNDS = 6


def cpu_probe_df(spark, cpus: int):
    """The fixed whole-stage-codegen probe plan (zero I/O, zero engine code)."""
    from pyspark.sql import functions as F

    r = spark.range(0, _PROBE_ROWS, 1, int(cpus) * 8)
    x = F.col("id")
    for _ in range(_LCG_ROUNDS):
        x = ((x % F.lit(2147483647)) * F.lit(1103515245).cast("long")
             + F.lit(12345)) % F.lit(2147483647)
    return r.select((x % F.lit(1000)).alias("x")).agg(F.avg("x"))


def cpu_probe_best(spark, cpus: int, reps: int = 2) -> float:
    """JIT-warm once, then best-of-``reps`` wall seconds, plan rebuilt per run."""
    cpu_probe_df(spark, cpus).collect()  # JIT warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        cpu_probe_df(spark, cpus).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best
