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


def test_record_downloads_merge(spark, lineage):
    """The reference's download mutation (catchment.py:636-663) as a set-oriented
    merge: counts increment, last/first timestamps update, non-terminal rejected."""
    import datetime as dt

    import pandas as pd

    df, pdf = lineage
    done_row = pdf[pdf["status"] == "done"].iloc[0]
    pending_row = pdf[pdf["status"].isin(["pending", "processing"])].iloc[0]
    t1 = dt.datetime(2026, 2, 1, 10, 0, 0)
    t2 = dt.datetime(2026, 2, 1, 12, 0, 0)
    downloads = spark.createDataFrame(
        pd.DataFrame(
            {
                "run_id": [int(done_row["run_id"])] * 2 + [int(pending_row["run_id"])],
                "downloaded_at": [t1, t2, t2],
            }
        )
    )
    updated = DB.record_downloads(df, downloads).toPandas().set_index("run_id")
    got = updated.loc[int(done_row["run_id"])]
    assert got["download_count"] == done_row["download_count"] + 2
    assert got["last_downloaded_at"] == t2
    if pd.isna(done_row["first_downloaded_at"]):
        assert got["first_downloaded_at"] == t1
    else:
        assert got["first_downloaded_at"] == done_row["first_downloaded_at"]
    # non-terminal runs unchanged (the 400 path)
    got_p = updated.loc[int(pending_row["run_id"])]
    assert got_p["download_count"] == pending_row["download_count"]
    rej = DB.rejected_downloads(df, downloads).toPandas()
    assert len(rej) == 1 and "not ready yet" in rej.iloc[0]["errors"]
    # unknown run id -> 404 error row
    ghost = spark.createDataFrame(
        pd.DataFrame({"run_id": [999999], "downloaded_at": [t1]})
    )
    rej2 = DB.rejected_downloads(df, ghost).toPandas()
    assert rej2.iloc[0]["errors"] == "CSV file not found"
    # dashboard consumes the updated rows: total_downloads rises by 2
    uid = int(done_row["user_id"])
    before = DB.total_downloads(df, uid).first()["total_downloads"]
    after = DB.total_downloads(DB.record_downloads(df, downloads), uid).first()[
        "total_downloads"
    ]
    assert after == before + 2
    # user rollup
    roll = DB.user_download_rollup(df, downloads).toPandas().set_index("user_id")
    assert roll.loc[uid]["total_csvs_downloaded"] >= 2
