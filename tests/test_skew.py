"""Skew-handling smoke test (SURVEY.md §5): salting must split hot-cell load.

The image-point fixture concentrates ~30% of points in the Delhi blob; hotspot
polygons then see candidate groups orders of magnitude larger than median.  Salted
refine groups must stay balanced: max group size with salt=8 should be ~1/8 of the
unsalted hot group (the per-task input-balance criterion 'no task >4x median').
"""

import pytest
from pyspark.sql import functions as F

from geojson_utility_spark import fixtures as FX
from geojson_utility_spark.functions.spark_geo import cell_expr, cell_parent_expr
from geojson_utility_spark.operators.spatial_join import normalize_polygons, polygon_cover


@pytest.fixture(scope="module")
def candidates(spark):
    pts = spark.createDataFrame(
        FX.image_point([f"img_{i:012d}" for i in range(20000)])
    ).withColumnRenamed("image_id", "point_id")
    polys = spark.createDataFrame(FX.make_polygons(40)[["polygon_id", "geojson"]])
    norm = normalize_polygons(polys)
    cover = polygon_cover(norm, zoom=13, compact=True).cache()
    zooms = sorted(r["cell_zoom"] for r in cover.select("cell_zoom").distinct().collect())
    fine = pts.withColumn("_cf", cell_expr(F.col("lat"), F.col("lon"), 13))
    probe = fine.withColumn(
        "_cell",
        F.explode(F.array(*[cell_parent_expr(F.col("_cf"), z, 13) for z in zooms])),
    )
    return probe.join(
        F.broadcast(cover.select("polygon_id", F.col("cell").alias("_cell"))),
        "_cell",
    ).cache()


def test_candidate_skew_exists(candidates):
    sizes = candidates.groupBy("polygon_id").count().toPandas()["count"]
    assert sizes.max() > 4 * sizes.median(), "fixture should be skewed (hot polygons)"


def test_salting_balances_groups(candidates):
    salt = 8
    salted_sizes = (
        candidates.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("point_id").cast("string")), F.lit(salt))
        )
        .groupBy("polygon_id", "_salt")
        .count()
        .toPandas()["count"]
    )
    unsalted_max = (
        candidates.groupBy("polygon_id").count().agg({"count": "max"}).collect()[0][0]
    )
    # the hot group must actually split ~salt-ways
    assert salted_sizes.max() < unsalted_max / (salt / 2)
    # task-balance criterion: no salted group more than 4x the mean of the top half
    top = salted_sizes.sort_values(ascending=False)
    assert top.iloc[0] <= 4 * top.iloc[: max(len(top) // 2, 1)].mean()
