"""Env-robustness gate for the driver contract (round-4 lesson).

The driver builds a PLAIN SparkSession — no repo configs, Arrow disabled — while
``tests/conftest.py`` uses ``get_spark()`` (Arrow on).  Round 4 shipped two
entries that passed all 211 tests yet crashed in the driver because
``createDataFrame`` with no schema on np.float64-in-list columns only works on
the Arrow path (``CANNOT_INFER_TYPE_FOR_FIELD embedding``).

This test pins the driver's environment: a fresh session with Arrow explicitly
OFF (the driver's default), every ``queries()`` entry constructed (eager
driver-side conversions — fixture createDataFrame, adaptive-cap collects — all
run at construction) and materialized to one row.  Reverting the explicit
schemas at entry_queries.q_cosine_near_dups / q_ivf_near_dups makes this fail.
"""

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

ALL_QUERIES = E.queries()


@pytest.fixture(scope="module")
def bare_spark(spark):
    """A session with the driver's conversion semantics.

    ``newSession()`` still inherits SQL confs set on the SparkContext at
    creation, so Arrow is forced off explicitly — that is the conf that selects
    the non-Arrow createDataFrame/toPandas fallback the driver exercises.
    """
    bare = spark.newSession()
    bare.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    bare.conf.set("spark.sql.session.timeZone", "UTC")
    return bare


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_entry_under_bare_session(bare_spark, name):
    df = ALL_QUERIES[name](bare_spark, SF_DIR)
    assert len(df.schema.fields) > 0
    df.limit(1).collect()


def test_entry_flagship_under_bare_session(bare_spark):
    assert E.entry(bare_spark).limit(1).collect() is not None
