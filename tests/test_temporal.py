"""as-of join operator: semantics + plan shape."""

import pandas as pd
import pytest

from geojson_utility_spark.operators.temporal import as_of_join


@pytest.fixture(scope="module")
def asof_frames(spark):
    l = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 2, 3],
        "ts": pd.to_datetime(["2024-01-10", "2024-01-25", "2024-01-05", "2024-01-15"]),
        "lv": ["a", "b", "c", "d"],
    }))
    r = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 2, 1],
        "rts": pd.to_datetime(["2024-01-08", "2024-01-20", "2024-01-09", "2024-01-20"]),
        "rv": [100, 200, 300, 250],
    }))
    return l, r


def test_as_of_semantics(spark, asof_frames):
    l, r = asof_frames
    out = (
        as_of_join(l, r, key="k", left_ts="ts", right_ts="rts",
                   right_cols=["rv"], tiebreaker="rv")
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert out["rv"].tolist()[0] == 100          # latest right before 01-10
    assert out["rv"].tolist()[1] == 250          # tie at 01-20 -> greatest wins
    assert pd.isna(out["rv"].tolist()[2])        # right row is AFTER the left row
    assert pd.isna(out["rv"].tolist()[3])        # key with no right rows
    assert len(out) == 4                         # left-join cardinality preserved


def test_as_of_equal_ts_inclusive(spark):
    l = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-20"]), "lv": ["x"]})
    )
    r = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rts": pd.to_datetime(["2024-01-20"]), "rv": [7]})
    )
    out = as_of_join(l, r, key="k", left_ts="ts", right_ts="rts",
                     right_cols=["rv"]).toPandas()
    assert out["rv"].tolist() == [7]             # <= semantics: same-instant matches


def test_as_of_plan_keyed_window(spark, asof_frames):
    """The window must be keyed (hashpartitioning on k), never a single-partition
    global sort — the scale contract of the tagged-union formulation."""
    l, r = asof_frames
    plan = (
        as_of_join(l, r, key="k", left_ts="ts", right_ts="rts", right_cols=["rv"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(k" in plan


def test_as_of_null_payload_not_resurrected(spark):
    """A NULL in the matched right row must NOT be backfilled from an older right
    row — the payload is carried as one struct (DuckDB ASOF row semantics)."""
    l = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-30"]), "lv": ["x"]})
    )
    import datetime as dt

    r = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10), 10.0, 5.0),
         (1, dt.datetime(2024, 1, 20), None, 7.0)],
        "k long, rts timestamp, price double, qty double",
    )
    out = as_of_join(l, r, key="k", left_ts="ts", right_ts="rts",
                     right_cols=["price", "qty"]).toPandas()
    assert pd.isna(out["price"].iloc[0])   # NOT 10.0 from the older row
    assert out["qty"].iloc[0] == 7.0


def test_as_of_rejects_colliding_names(spark, asof_frames):
    l, r = asof_frames
    with pytest.raises(ValueError, match="reserved"):
        as_of_join(l.withColumn("_ts", l["ts"]), r, key="k", left_ts="ts",
                   right_ts="rts", right_cols=["rv"])
    with pytest.raises(ValueError, match="collide with left"):
        as_of_join(l, r.withColumnRenamed("rv", "lv"), key="k", left_ts="ts",
                   right_ts="rts", right_cols=["lv"])
