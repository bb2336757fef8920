"""Deterministic sampling operators for large-scale training-data pipelines.

A 100 TB pipeline cannot use RNG-state sampling (``df.sample``/``sampleBy`` are
partition-layout- and seed-stream-dependent): held-out splits must be a PURE
FUNCTION of row identity so every run, engine, and backfill selects the same
rows.  These operators key every decision on a hash of the row's id:

- :func:`hash_sample` — deterministic Bernoulli: keep iff
  ``bucket(hash(key, seed)) < fraction * 1e6``.  A pure codegen filter: zero
  shuffle, predicate evaluated at the scan, scales embarrassingly.
- :func:`stratified_sample` — per-stratum fractions via one CASE over the same
  bucket; unlisted strata keep fraction 0.  Still a zero-shuffle filter.
- :func:`reservoir_k` — EXACT k rows per stratum, deterministically: rank by
  (hash, key) within the stratum and keep rank <= k ("deterministic
  reservoir").  One window shuffle keyed on the stratum; for degenerate
  single-stratum inputs at extreme N prefer :func:`hash_sample` to a global
  sort, or pre-filter with ``hash_sample`` at ~2k/N to bound the sorted set
  (the classic two-phase top-k).

hash_family:
  'xxhash64' (default) — the production family: fastest JVM hash, whole-stage
    codegen, pinned against the repo's independent pure-Python XXH64 by pytest.
  'md5'      — the SQL-reproducible family (first 15 md5 hex chars -> 60-bit
    int, the ``simhash_md5`` recipe): lets an ANSI-SQL engine reproduce the
    selection bit-for-bit — the ``sample_stratified`` driver entry's oracle.

Buckets are ``hash mod 1_000_000`` (md5: over a 60-bit non-negative value;
xxhash64: ``pmod`` of the signed 64-bit).  The modulo bias over 2^60 buckets is
~1e-12 — and irrelevant for correctness testing because the oracle reproduces
the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key: Column, seed: int, hash_family: str) -> Column:
    """Uniform bucket in [0, 1e6) as a deterministic function of (key, seed)."""
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(key.cast("string"), F.lit(seed)), F.lit(_BUCKETS))
    if hash_family == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, 15),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(_BUCKETS))
    raise ValueError(f"unknown hash_family {hash_family!r}")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(round(fraction * _BUCKETS))


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli sample: the SAME rows on every run and engine."""
    return df.filter(
        _bucket(F.col(key_col), seed, hash_family) < F.lit(_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic fractions (unlisted strata are dropped).

    One CASE maps the stratum to its integer threshold, compared against the
    row's hash bucket — a single codegen filter, no shuffle, no per-stratum
    scans (``sampleBy`` semantics, reproducibility ``sampleBy`` lacks)."""
    expr: Column = F.lit(0)
    for stratum, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(_threshold(frac))
        ).otherwise(expr)
    return df.filter(_bucket(F.col(key_col), seed, hash_family) < expr)


def reservoir_k(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """EXACT k rows per stratum, deterministic: rank by (hash bucket, key).

    The key tiebreak makes the selection total-order-stable even across bucket
    collisions, so the output is unique and engine-reproducible."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(_bucket(F.col(key_col), seed, hash_family), F.col(key_col))
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
