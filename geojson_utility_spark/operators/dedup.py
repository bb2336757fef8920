"""Deduplication operators for large-scale training-data pipelines.

All set-oriented, shuffle-minimal designs:
- exact:      hash-groupBy on content (map-side partial agg; one shuffle on the hash)
- minhash+LSH: shingles -> minhash signature -> banded bucket join (near-dup pairs
               found with an equi-join on (band, bucket-hash) — no O(N^2) compare)
- simhash:    64-bit weighted-feature hash; near-dups = small hamming distance within
              LSH buckets on bit-chunks
- ngram-jaccard: exact Jaccard on character n-gram sets for candidate pairs
- phash near-dup: hamming distance on the images table's perceptual hash, bucketed by
              16-bit chunks (any pair within distance d shares a chunk when d < chunks)

Every operator keeps the big table distributed; only per-row feature computation runs
in (vectorized) expressions or Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct content value (deterministic winner).

    One shuffle, partial-agg friendly: semantically
    ``row_number() OVER (PARTITION BY content ORDER BY id) = 1`` but implemented as
    min-id groupBy + semi join so the heavy content column shuffles once as a key.
    """
    winners = df.groupBy(content_col).agg(F.min(id_col).alias(id_col))
    # dropDuplicates on id: a semi join keeps BOTH physical copies of an identical row
    return df.join(winners, [content_col, id_col], "left_semi").dropDuplicates([id_col])


def exact_dup_groups(df: DataFrame, content_col: str) -> DataFrame:
    """(content, n_copies) for duplicated content — the P4/P5 duplicate-report shape."""
    return (
        df.groupBy(content_col)
        .agg(F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def _shingles(col, n: int = 8):
    """Character n-gram array of the normalized text (lowercased, squeezed spaces).

    Default n=8: long enough that unrelated documents over a shared vocabulary do not
    collide (char-3-grams of same-domain text have ~0.5 Jaccard between RANDOM pairs,
    flooding LSH with all-pairs candidates; 8-grams drop that to ~0.04)."""
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    # NOTE: no array_distinct — it is O(len^2) per row on string arrays and
    # unnecessary: min() is duplicate-insensitive and array_intersect/array_union
    # already use set semantics, so every consumer sees set behavior anyway.
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
        lambda i: F.substring(norm, i, F.lit(n)),
    )


def shingle_df(df: DataFrame, text_col: str, id_col: str, n: int = 8) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"), _shingles(F.col(text_col), n).alias("shingles")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 32, shingle_n: int = 8
) -> DataFrame:
    """(doc_id, sig: array<bigint>) — minhash over character shingles.

    Physical shape (same pattern as simhash64): explode shingles -> ``n_hashes``
    flat xxhash64 columns (whole-stage codegen) -> ONE groupBy(doc_id) with
    ``n_hashes`` min() aggregates (map-side partial agg) -> assemble the signature
    array.  The naive nested-lambda formulation (transform over seeds x array_min
    over shingles) allocates 32 intermediate arrays per row outside codegen and is
    ~100x slower — do not regress to it.
    """
    # normalize ONCE per doc, then explode a position sequence and slice with a
    # codegen substring — no per-row array-of-strings materialization, no interpreted
    # higher-order lambda, no re-evaluated regexp per shingle
    norm = df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("_norm"),
    )
    exploded = norm.select(
        "doc_id",
        "_norm",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("_norm") - (shingle_n - 1), F.lit(1))
            )
        ).alias("_i"),
    ).withColumn("shingle", F.substring(F.col("_norm"), F.col("_i"), F.lit(shingle_n)))
    # hash the shingle STRING once; derive the hash family from the resulting long
    # (xxhash64 over 8 bytes per member instead of re-traversing the string n times)
    hashed = exploded.withColumn("_h0", F.xxhash64("shingle")).select(
        "doc_id",
        *[F.xxhash64("_h0", F.lit(i)).alias(f"h{i}") for i in range(n_hashes)],
    )
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(n_hashes)]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(n_hashes)]).alias("sig")
    )


def minhash_candidate_pairs(
    signatures: DataFrame, n_bands: int = 8
) -> DataFrame:
    """LSH banding: split each signature into bands, bucket-join on (band, band-hash).

    Returns distinct (doc_a, doc_b) candidate pairs (doc_a < doc_b).  The only shuffle
    is the equi-join on the banded bucket key — never an all-pairs compare.
    """
    n_hashes_col = F.size(F.col("sig"))
    rows_per_band = (n_hashes_col / n_bands).cast("int")
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, pairs: DataFrame, shingle_n: int = 8
) -> DataFrame:
    """Exact n-gram Jaccard for given candidate (doc_a, doc_b) pairs.

    Plan: explode DISTINCT shingles for docs appearing in a pair (semi join first —
    the verify stage touches the candidate set, never the corpus), then intersection
    sizes via two codegen equi-joins + a count.  Never ``array_intersect``: Spark's
    array set ops on large string arrays are interpreted per-element and cost ~15 ms
    per 600x600 pair — orders of magnitude slower than the join plan.
    """
    needed = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    # codegen shingle stream (normalize once -> explode positions -> substring):
    # exploding an interpreted-transform ARRAY costs ~20 ms/row; this is ~100x faster
    norm = df.join(needed, id_col, "left_semi").select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("_norm"),
    )
    sh_ex = (
        norm.select(
            "doc_id",
            "_norm",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.length("_norm") - (shingle_n - 1), F.lit(1))
                )
            ).alias("_i"),
        )
        .select(
            "doc_id",
            F.substring(F.col("_norm"), F.col("_i"), F.lit(shingle_n)).alias("shingle"),
        )
        .distinct()
        .cache()
    )
    sizes = sh_ex.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    ex_a = sh_ex.select(F.col("doc_id").alias("doc_a"), "shingle")
    ex_b = sh_ex.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(ex_a, "doc_a")
        .join(ex_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0)))
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidates -> exact
    Jaccard verify -> pairs over threshold."""
    # materialize signatures once (tiny: one row of n_hashes longs per doc) — the
    # banding SELF-join would otherwise evaluate the whole shingle+hash subtree twice
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n).localCheckpoint()
    # cache the (small) candidate-pair set: the verify stage consumes it twice
    # (doc semi-join + pair join)
    cands = minhash_candidate_pairs(sigs, n_bands).cache()
    return jaccard_pairs(df, text_col, id_col, cands, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, simhash bigint): weighted-bit majority over token xxhash64 features.

    Physical shape: explode tokens -> xxhash64 (JVM) -> ONE groupBy(doc_id) carrying 64
    vectorized sum aggregates (per-bit +1/-1 votes, map-side partial agg) -> sign
    bitmap assembled with bitwise ORs.  Single shuffle on doc_id; no Python anywhere.
    """
    tokens = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    exploded = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens).alias("tok"))
    hashed = exploded.withColumn("th", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("th"), bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{bit}")
        for bit in range(64)
    ]
    votes = hashed.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for bit in range(64):
        bitval = (
            F.lit(-(1 << 63)).cast("long") if bit == 63 else F.lit(1 << bit).cast("long")
        )
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{bit}") > 0, bitval).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc_id", sim.alias("simhash"))


def hamming_expr(a, b):
    """bit_count(a XOR b) — Spark's bit_count is JVM-side."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame, text_col: str, id_col: str, max_distance: int = 6
) -> DataFrame:
    """Near-dup pairs by simhash hamming <= max_distance, bucketed on 16-bit chunks.

    Pigeonhole: distance <= 3 guarantees a shared chunk with 4 chunks; for larger
    max_distance this is a high-recall heuristic (documented), still never all-pairs.
    """
    sims = simhash64(df, text_col, id_col)
    chunks = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming_expr(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )


def phash_near_dups(images: DataFrame, max_distance: int = 8) -> DataFrame:
    """Image near-dups on the input table's phash column (16-bit chunk LSH buckets)."""
    chunks = images.select(
        F.col("image_id"),
        F.col("phash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("image_a"),
            F.col("b.image_id").alias("image_b"),
            hamming_expr(F.col("a.phash"), F.col("b.phash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )
