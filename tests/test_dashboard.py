"""Dashboard aggregates over the lineage fixture vs pandas oracles."""

import datetime as dt

import pytest

from geojson_utility_spark import fixtures as FX
from geojson_utility_spark.operators import dashboard as DB
from geojson_utility_spark.schemas import LINEAGE_SCHEMA

ANCHOR = dt.datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def lineage(spark):
    pdf = FX.make_lineage()
    return spark.createDataFrame(pdf, schema=LINEAGE_SCHEMA).cache(), pdf


def test_counts_and_sums(lineage):
    df, pdf = lineage
    for uid in (0, 3, 7):
        sub = pdf[pdf["user_id"] == uid]
        assert DB.user_file_count(df, uid).first()["total_files"] == len(sub)
        assert (
            DB.total_downloads(df, uid).first()["total_downloads"]
            == sub["download_count"].sum()
        )
        got7 = DB.seven_day_count(df, uid, ANCHOR).first()["uploads_7d"]
        want7 = (sub["created_at"] >= ANCHOR - dt.timedelta(days=7)).sum()
        assert got7 == want7


def test_last_downloaded(lineage):
    df, pdf = lineage
    uid = 1
    sub = pdf[(pdf["user_id"] == uid) & pdf["last_downloaded_at"].notna()]
    want = sub.sort_values(["last_downloaded_at", "run_id"],
                           ascending=[False, True]).iloc[0]["run_id"]
    got = DB.last_downloaded(df, uid).first()["run_id"]
    assert got == want


def test_pagination_clamped(lineage):
    df, pdf = lineage
    uid = 2
    sub = pdf[pdf["user_id"] == uid].sort_values(
        ["created_at", "run_id"], ascending=[False, True]
    )
    page2 = DB.recent_uploads_page(df, uid, page=2, per_page=5).toPandas()
    assert page2["run_id"].tolist() == sub.iloc[5:10]["run_id"].tolist()
    # page beyond total clamps to last page
    import math

    last_page = math.ceil(len(sub) / 5)
    clamped = DB.recent_uploads_page(df, uid, page=999, per_page=5).toPandas()
    want_last = sub.iloc[(last_page - 1) * 5 : last_page * 5]["run_id"].tolist()
    assert clamped["run_id"].tolist() == want_last


def test_dashboard_stats_bundle(lineage):
    df, pdf = lineage
    stats = DB.dashboard_stats(df, 4, ANCHOR)
    sub = pdf[pdf["user_id"] == 4]
    assert stats["total_files"] == len(sub)
    assert stats["total_downloads"] == sub["download_count"].sum()


def test_status_percentages(lineage):
    df, pdf = lineage
    got = DB.status_percentages(df).toPandas().set_index("status")
    for status, n in pdf["status"].value_counts().items():
        assert got.loc[status, "n"] == n
        assert got.loc[status, "pct"] == round(100.0 * n / len(pdf), 1)


def test_downloadable_runs_gate(lineage):
    df, pdf = lineage
    got = DB.downloadable_runs(df).toPandas()
    want = pdf[~pdf["status"].isin(["pending", "processing"])]
    assert len(got) == len(want)
    assert set(got["status"]) <= {"done", "partial", "failed"}
