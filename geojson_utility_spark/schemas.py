"""Explicit StructType schemas — the engine never infers schemas (SURVEY.md §1.3).

The ``images`` schema is the BASELINE.json ``input_hint`` verbatim; ``locations`` is the
reference's upload-CSV contract (reference: backend/sample.csv + required-column set at
backend/routers/catchment.py:175); ``lineage`` mirrors the reference's ``csv_files``
metrics model (backend/models/csvfile.py:4-32) plus engine partition/stage columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# BASELINE.json input_hint: (image_id:string, bytes:binary, w:int32, h:int32,
#                            fmt:string, caption:string, phash:int64)
IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# reference upload CSV: required columns at backend/routers/catchment.py:175
LOCATIONS_SCHEMA = T.StructType(
    [
        T.StructField("snp_id", T.StringType(), True),
        T.StructField("provider_id", T.StringType(), True),
        T.StructField("location_id", T.StringType(), True),
        T.StructField("location_gps", T.StringType(), True),
        T.StructField("drive_distance", T.StringType(), True),
        T.StructField("drive_time", T.StringType(), True),
    ]
)

REQUIRED_LOCATION_COLUMNS = {
    "snp_id",
    "provider_id",
    "location_id",
    "location_gps",
    "drive_distance",
    "drive_time",
}

POLYGONS_SCHEMA = T.StructType(
    [
        T.StructField("polygon_id", T.StringType(), False),
        T.StructField("snp_id", T.StringType(), True),
        T.StructField("provider_id", T.StringType(), True),
        T.StructField("location_id", T.StringType(), True),
        T.StructField("geojson", T.StringType(), True),
        T.StructField("centroid_lat", T.DoubleType(), True),
        T.StructField("centroid_lon", T.DoubleType(), True),
    ]
)

# clone of reference csv_files columns (backend/models/csvfile.py:4-32)
# + engine additions partition_id/stage (FIXTURES.md §4)
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.IntegerType(), False),
        T.StructField("filename", T.StringType(), True),
        T.StructField("username", T.StringType(), True),
        T.StructField("user_id", T.IntegerType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("total_rows", T.IntegerType(), True),
        T.StructField("successful_rows", T.IntegerType(), True),
        T.StructField("failed_rows", T.IntegerType(), True),
        T.StructField("processing_started_at", T.TimestampType(), True),
        T.StructField("processing_completed_at", T.TimestampType(), True),
        T.StructField("processing_duration_seconds", T.IntegerType(), True),
        T.StructField("download_count", T.IntegerType(), True),
        T.StructField("last_downloaded_at", T.TimestampType(), True),
        T.StructField("first_downloaded_at", T.TimestampType(), True),
        T.StructField("lepton_api_calls_made", T.IntegerType(), True),
        T.StructField("tokens_consumed", T.IntegerType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("stage", T.StringType(), True),
    ]
)

# enrichment output: input columns + geojson + errors (backend/routers/catchment.py:373-374)
ENRICHED_SCHEMA = T.StructType(
    LOCATIONS_SCHEMA.fields
    + [
        T.StructField("geojson", T.StringType(), True),
        T.StructField("errors", T.StringType(), True),
    ]
)

POINTS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
    ]
)
