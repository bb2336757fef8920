"""Locations CSV source/sink — the reference's S1/S2/S4 operators (SURVEY.md §2.1).

Reading keeps every column as *string* (the reference parses with pandas and
re-stringifies per row, so typed inference would CHANGE semantics — e.g. '500.5' vs
500.5 both stringify to '500.5' but '500.50' would collapse to '500.5' under double
inference).  Header whitespace is stripped (P1).  File-level guards (P3) are exposed
as a manifest check, not hidden I/O.
"""

from __future__ import annotations

import io
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geojson_utility_spark.operators.validation import normalize_headers

MAX_UPLOAD_BYTES = 10 * 1024 * 1024  # reference: catchment.py:138-140
MAX_ROWS = 1000  # reference: catchment.py:155-156 (engine default raised via param)


def read_locations_csv(
    spark: SparkSession, path: str, enforce_reference_limits: bool = False
) -> DataFrame:
    """All-string CSV read + header normalization.

    enforce_reference_limits: apply the reference's 10 MB / 1000-row ingest guards
    (useful for golden parity; the engine itself has no such limits).
    """
    if enforce_reference_limits:
        size = os.path.getsize(path)
        if size > MAX_UPLOAD_BYTES:
            # VERBATIM reference message incl. its "2MB" quirk — the code enforces
            # 10 MB while the text claims 2 MB (catchment.py:138-140); golden
            # parity reproduces the string exactly, limit follows the code
            raise ValueError("CSV file too large (max 2MB)")
        if not path.endswith(".csv"):
            raise ValueError("File must be a CSV with a valid filename")
    df = (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    df = normalize_headers(df)
    if enforce_reference_limits and df.count() > MAX_ROWS:
        raise ValueError("CSV file has too many rows (max 1000)")
    return df


def write_locations_csv(df: DataFrame, path: str) -> None:
    """Header CSV sink (single directory of part files — the distributed contract;
    the reference's single-blob output is the coalesce(1) special case)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def sample_csv_frame(spark: SparkSession) -> DataFrame:
    """S4: the 2-row template (reference: catchment.py:118-132, verbatim values)."""
    rows = [
        ("snp_1.com", "provider1", "L1", "28.5065162,77.073938", "500.5", ""),
        ("snp_2.com", "provider2", "L2", "30.7135305,76.7454157", "", "20.5"),
    ]
    return spark.createDataFrame(
        rows,
        ["snp_id", "provider_id", "location_id", "location_gps",
         "drive_distance", "drive_time"],
    )
