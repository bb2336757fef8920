#!/usr/bin/env python
"""Adversarial-scale bench for the capped near-dup operators (VERDICT r3 item 6).

Four measurements, each printed as one JSON line:

1. minhash_cap_bound — 1M synthetic signatures with a PLANTED 30k-member band-0
   bucket whose members are otherwise random (mutual jaccard ~0): the exact
   degenerate shape the hot-bucket cap defends against — boilerplate docs that
   collide in one band but are NOT near-dups, where the uncapped single-band
   self-join materializes |bucket|^2/2 = 4.5e8 FALSE candidates.  Capped run
   must return ~0 candidates (no pair shares >= 2 over-cap buckets) in bounded
   time; the uncapped run is measured for contrast.
   (A cluster of genuinely NEAR-IDENTICAL docs is deliberately not the probe:
   its pairs are all true near-dups, so the OUTPUT is quadratic in cluster size
   no matter the candidate machinery — that shape needs upstream exact dedup,
   as documented in the operator contracts.)

2. cosine_1m — full cosine_near_dups over 1M deterministic 64-dim vectors with
   100 planted near-dup pairs, n_bits sized per the operator docstring
   (2^24 buckets at N=1M keeps random candidates ~linear).  Wall time + output.

3. minhash_1m — full minhash_near_dups over 1M synthetic ~130-char docs where
   doc i and doc i+500000 share a body and differ by a suffix (500k true
   near-dup pairs).  Wall time + output.

4. ngram_1m — full EXACT ngram_jaccard_pairs_exact (PPJoin prefix filter) over
   the same 1M-doc corpus as (3): exactness at scale has no LSH misses, so
   result_pairs must equal true_pairs exactly.

Run: python scripts/neardup_scale_bench.py [steps]   e.g. "1,2" (default all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _drop_shingle_tables(spark):
    """Drop the step's bucketed shingle table once counted — at 10M docs each
    run's table is ~7 GB and this host's effective disk is ~93 GB."""
    from geojson_utility_spark.operators.dedup import cleanup_shingle_tables

    cleanup_shingle_tables(spark)


def cpu_probe(spark):
    """Best-of-2 shared pure-CPU probe (geojson_utility_spark/hostprobe.py) —
    bracket every 1M measurement so host phase noise is visible in the record."""
    from geojson_utility_spark.hostprobe import cpu_probe_best

    return round(cpu_probe_best(spark, int(CPUS)), 3)


def main():
    steps = set((sys.argv[1] if len(sys.argv) > 1 else "1,2,3,4").split(","))
    from pyspark.sql import functions as F

    from geojson_utility_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_near_dups,
    )
    from geojson_utility_spark.operators.similarity import cosine_near_dups
    from geojson_utility_spark.session import get_spark

    spark = get_spark(app_name="neardup_scale", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))

    if "1" in steps:
        n, planted = 1_000_000, 30_000
        sigs = spark.range(0, n, 1, int(CPUS) * 4).select(
            F.col("id").alias("doc_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda s: F.when(
                    (F.col("id") < planted) & (s < 4), s * 1000 + 7
                ).otherwise(F.xxhash64(F.col("id"), s)),
            ).alias("sig"),
        ).localCheckpoint()
        p_before = cpu_probe(spark)
        t0 = time.perf_counter()
        capped = minhash_candidate_pairs(sigs, n_bands=8, bucket_cap=20_000).count()
        t_capped = time.perf_counter() - t0
        t0 = time.perf_counter()
        uncapped = minhash_candidate_pairs(sigs, n_bands=8, bucket_cap=None).count()
        t_uncapped = time.perf_counter() - t0
        print(json.dumps({
            "bench": "minhash_cap_bound", "n_sigs": n, "planted_bucket": planted,
            "capped_candidates": capped, "capped_sec": round(t_capped, 2),
            "uncapped_candidates": uncapped, "uncapped_sec": round(t_uncapped, 2),
            "probe_before": p_before, "probe_after": cpu_probe(spark),
        }), flush=True)

    if "2" in steps:
        n, dim, n_pairs = 1_000_000, 64, 100
        # deterministic pseudo-normal components from id hashing (Box-Muller-free:
        # sum of 4 uniforms - 2, CLT-ish is fine for bucketing geometry)
        unif = lambda c, k: (F.pmod(F.xxhash64(c, F.lit(k)), 100_000) / 100_000.0)
        base = F.col("base")
        vec = F.array(*[
            (unif(base, 4 * j) + unif(base, 4 * j + 1)
             + unif(base, 4 * j + 2) + unif(base, 4 * j + 3) - 2.0)
            for j in range(dim)
        ])
        vecs = spark.range(0, n, 1, int(CPUS) * 4).select(
            F.col("id").alias("vec_id"),
            # ids n-1-i (i < n_pairs) mirror id i with a tiny deterministic nudge
            F.when(F.col("id") >= n - n_pairs, F.lit(n - 1) - F.col("id"))
            .otherwise(F.col("id")).alias("base"),
            (F.col("id") >= n - n_pairs).alias("_nudge"),
        ).select(
            "vec_id",
            F.transform(
                vec, lambda x, i: x + F.when(F.col("_nudge"), 0.001 * (i % 7)).otherwise(0.0)
            ).alias("embedding"),
        ).localCheckpoint()
        p_before = cpu_probe(spark)
        t0 = time.perf_counter()
        out = cosine_near_dups(vecs, threshold=0.9, n_bits=24, n_tables=8).count()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "bench": "cosine_1m", "n_vecs": n, "dim": dim,
            "planted_pairs": n_pairs, "result_pairs": out, "sec": round(dt, 2),
            "probe_before": p_before, "probe_after": cpu_probe(spark),
        }), flush=True)

    # NEARDUP_ALPHABET=b64 swaps the 16-char hex bodies for base64 (64-char
    # alphabet): shingle space 64^8 ~ 2.8e14 vs hex's 16^8 = 4.3e9, i.e. the
    # high-entropy regime of real text where chance-shared 8-grams are rare.
    # hex (default) is the adversarial low-entropy case — at 10M docs its
    # birthday-shared shingles make ANY complete candidate generator quadratic.
    alphabet = os.environ.get("NEARDUP_ALPHABET", "hex")

    def _body(col):
        h = F.md5(col.cast("string"))
        return F.base64(F.unhex(h)) if alphabet == "b64" else h

    def synth_docs(n, half):
        return spark.range(0, n, 1, int(CPUS) * 4).select(
            F.col("id").alias("doc_id"),
            F.concat(
                _body(F.pmod(F.col("id"), half)),
                _body(F.pmod(F.col("id"), half) * 3 + 1),
                _body(F.pmod(F.col("id"), half) * 7 + 2),
                _body(F.pmod(F.col("id"), half) * 13 + 3),
                F.when(F.col("id") < half, F.lit(" alpha")).otherwise(F.lit(" beta")),
            ).alias("text"),
        ).localCheckpoint()

    # NEARDUP_N_DOCS scales steps 3/4 past the default 1M (e.g. 10000000 for
    # the VERDICT r5 task-3 build-side measurement at 10M docs)
    n_env = int(os.environ.get("NEARDUP_N_DOCS", "1000000"))
    tag = f"{n_env // 1_000_000}m" if n_env >= 1_000_000 else str(n_env)

    if "3" in steps:
        n, half = n_env, n_env // 2
        docs = synth_docs(n, half)
        p_before = cpu_probe(spark)
        t0 = time.perf_counter()
        out = minhash_near_dups(docs, "text", "doc_id", threshold=0.8,
                                storage_level="DISK_ONLY").count()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "bench": f"minhash_{tag}", "n_docs": n, "true_pairs": half,
            "result_pairs": out, "sec": round(dt, 2),
            "probe_before": p_before, "probe_after": cpu_probe(spark),
        }), flush=True)
        _drop_shingle_tables(spark)

    if "4" in steps:
        from geojson_utility_spark.operators.dedup import ngram_jaccard_pairs_exact

        n, half = n_env, n_env // 2
        docs = synth_docs(n, half)
        p_before = cpu_probe(spark)
        t0 = time.perf_counter()
        doc_freq = os.environ.get("NGRAM_DOC_FREQ", "exact")
        out = ngram_jaccard_pairs_exact(docs, "text", "doc_id", threshold=0.8,
                                        storage_level="DISK_ONLY",
                                        doc_freq=doc_freq).count()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "bench": f"ngram_{tag}", "n_docs": n, "true_pairs": half,
            "doc_freq": doc_freq, "alphabet": alphabet,
            "result_pairs": out, "sec": round(dt, 2),
            "probe_before": p_before, "probe_after": cpu_probe(spark),
        }), flush=True)
        _drop_shingle_tables(spark)

    spark.stop()


if __name__ == "__main__":
    main()
