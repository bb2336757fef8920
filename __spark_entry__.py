"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``geojson_utility_spark/entry_queries.py``; this module stays a
thin adapter so the engine package is importable on executors via --py-files.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the two-phase H3-style spatial join
    (broadcast cell candidates + Arrow PIP refine) of image-derived points vs
    ONDC-shaped catchment polygons."""
    from geojson_utility_spark.entry_queries import q_flagship_image_join

    return q_flagship_image_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geojson_utility_spark.entry_queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from geojson_utility_spark.entry_queries import oracle_sql as _o

    return _o()
