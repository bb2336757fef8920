"""Dashboard/analytics aggregates over the lineage table (reference §3.3).

Reproduces GET /user-dashboard/stats (reference: backend/routers/user_dashboard.py:
40-71): total count, clamped pagination window, top-1 last-downloaded, 7-day count,
coalesce-sum of downloads — all served from ONE cached DataFrame pass.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_file_count(lineage: DataFrame, user_id: int) -> DataFrame:
    return lineage.filter(F.col("user_id") == user_id).agg(
        F.count("*").alias("total_files")
    )


def last_downloaded(lineage: DataFrame, user_id: int) -> DataFrame:
    """Top-1 by last_downloaded_at (W1) — ``orderBy().limit(1)``.

    Spark plans this as TakeOrderedAndProject: each partition keeps a 1-row heap and
    the driver merges — parallel at any scale.  The unpartitioned ``row_number()``
    window formulation funnels every row through ONE task (a global sort exchange)
    and is the classic scale bottleneck; do not regress to it.
    """
    return (
        lineage.filter(
            (F.col("user_id") == user_id) & F.col("last_downloaded_at").isNotNull()
        )
        .orderBy(F.col("last_downloaded_at").desc(), F.col("run_id").asc())
        .limit(1)
        .select("run_id", "filename", "last_downloaded_at")
    )


def recent_uploads_page(
    lineage: DataFrame, user_id: int, page: int, per_page: int = 10
) -> DataFrame:
    """W2 pagination: ORDER BY created_at DESC OFFSET/LIMIT with page clamped to
    total_pages (user_dashboard.py:44-47).

    Scale shape: ``orderBy().limit(offset + per_page)`` is TakeOrderedAndProject
    (parallel per-partition heaps of ``offset+per_page`` rows, no global sort
    exchange); the row_number window then ranks only that ≤ offset+per_page row
    result — bounded by page depth, never by table size.  For unbounded page depth
    use :func:`uploads_before_cursor` (keyset pagination) instead.
    """
    base = lineage.filter(F.col("user_id") == user_id)
    total = base.count()
    total_pages = max(1, -(-total // per_page))
    page = min(max(1, page), total_pages)
    offset = (page - 1) * per_page
    head = base.orderBy(F.col("created_at").desc(), F.col("run_id").asc()).limit(
        offset + per_page
    )
    w = Window.orderBy(F.col("created_at").desc(), F.col("run_id").asc())
    return (
        head.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > offset)
        .select("run_id", "filename", "status", "created_at", "rn")
    )


def uploads_before_cursor(
    lineage: DataFrame,
    user_id: int,
    cursor_created_at,
    cursor_run_id: int,
    per_page: int = 10,
) -> DataFrame:
    """Keyset pagination — the 100 TB-safe page operator.

    Instead of a global rank, the page is "the ``per_page`` newest rows strictly
    after the cursor" in (created_at DESC, run_id ASC) order: a pushdown-friendly
    range predicate + TakeOrderedAndProject.  Cost is O(scan of the predicate range)
    per page regardless of page depth; the cursor for the next page is the last row
    of this one.  (The rank-offset formulation degrades linearly with offset and
    globally sorts; keyset is how every web-scale feed paginates.)
    """
    after_cursor = (F.col("created_at") < F.lit(cursor_created_at)) | (
        (F.col("created_at") == F.lit(cursor_created_at))
        & (F.col("run_id") > F.lit(cursor_run_id))
    )
    return (
        lineage.filter((F.col("user_id") == user_id) & after_cursor)
        .orderBy(F.col("created_at").desc(), F.col("run_id").asc())
        .limit(per_page)
        .select("run_id", "filename", "status", "created_at")
    )


def seven_day_count(
    lineage: DataFrame, user_id: int, now: dt.datetime
) -> DataFrame:
    """A5: uploads in the trailing 7 days (fixed anchor, no wall clock)."""
    cutoff = now - dt.timedelta(days=7)
    return lineage.filter(
        (F.col("user_id") == user_id) & (F.col("created_at") >= F.lit(cutoff))
    ).agg(F.count("*").alias("uploads_7d"))


def total_downloads(lineage: DataFrame, user_id: int) -> DataFrame:
    """A6: coalesce(sum(download_count), 0)."""
    return lineage.filter(F.col("user_id") == user_id).agg(
        F.coalesce(F.sum("download_count"), F.lit(0)).alias("total_downloads")
    )


def dashboard_stats(lineage: DataFrame, user_id: int, now: dt.datetime) -> dict:
    """The full §3.3 response from one cached DF."""
    base = lineage.filter(F.col("user_id") == user_id).cache()
    try:
        agg = base.agg(
            F.count("*").alias("total_files"),
            F.coalesce(F.sum("download_count"), F.lit(0)).alias("total_downloads"),
            F.sum(
                (F.col("created_at") >= F.lit(now - dt.timedelta(days=7))).cast("int")
            ).alias("uploads_7d"),
        ).collect()[0]
        last = (
            base.filter(F.col("last_downloaded_at").isNotNull())
            .orderBy(F.col("last_downloaded_at").desc(), F.col("run_id").asc())
            .limit(1)
            .collect()
        )
        return {
            "total_files": agg["total_files"],
            "total_downloads": int(agg["total_downloads"]),
            "uploads_7d": int(agg["uploads_7d"] or 0),
            "last_downloaded_run_id": last[0]["run_id"] if last else None,
        }
    finally:
        base.unpersist()


def downloadable_runs(lineage: DataFrame) -> DataFrame:
    """P13 status-gate filter: downloads only when status is terminal
    (reference: catchment.py:636-637 rejects pending/processing)."""
    return lineage.filter(~F.col("status").isin("pending", "processing"))


def record_downloads(lineage: DataFrame, downloads: DataFrame) -> DataFrame:
    """Apply download events to the lineage table — the set-oriented MERGE of the
    reference's per-download mutation (/root/reference/backend/routers/catchment.py:
    636-663: 400 unless status is terminal, then ``download_count += 1``,
    ``last_downloaded_at = now``, ``first_downloaded_at`` set once).

    ``downloads``: (run_id, downloaded_at).  Downloads against non-terminal runs are
    REJECTED exactly like the reference's 400 (dropped from the merge; use
    :func:`rejected_downloads` for the error report).  Returns the updated lineage
    (copy-on-write: Spark tables are immutable — at scale this is the MERGE INTO
    shape over an Iceberg/Delta table, one broadcast join of the small delta).
    """
    agg = downloads.groupBy("run_id").agg(
        F.count("*").alias("_n_dl"),
        F.max("downloaded_at").alias("_last_dl"),
        F.min("downloaded_at").alias("_first_dl"),
    )
    terminal = ~F.col("status").isin("pending", "processing")
    merged = lineage.join(F.broadcast(agg), "run_id", "left")
    applied = F.col("_n_dl").isNotNull() & terminal
    return (
        merged.withColumn(
            "download_count",
            F.when(applied, F.col("download_count") + F.col("_n_dl")).otherwise(
                F.col("download_count")
            ),
        )
        .withColumn(
            "last_downloaded_at",
            F.when(
                applied,
                F.greatest(
                    F.coalesce(F.col("last_downloaded_at"), F.col("_last_dl")),
                    F.col("_last_dl"),
                ),
            ).otherwise(F.col("last_downloaded_at")),
        )
        .withColumn(
            "first_downloaded_at",
            F.when(
                applied, F.coalesce(F.col("first_downloaded_at"), F.col("_first_dl"))
            ).otherwise(F.col("first_downloaded_at")),
        )
        .drop("_n_dl", "_last_dl", "_first_dl")
    )


def rejected_downloads(lineage: DataFrame, downloads: DataFrame) -> DataFrame:
    """Download attempts the reference answers with 400 ('not ready yet'): runs still
    pending/processing, plus unknown run ids (404) — filter-that-annotates shape."""
    status = lineage.select("run_id", "status")
    joined = downloads.join(status, "run_id", "left")
    err = (
        F.when(F.col("status").isNull(), F.lit("CSV file not found"))
        .when(
            F.col("status").isin("pending", "processing"),
            F.concat(
                F.lit("CSV file is not ready yet. Current status: "), F.col("status")
            ),
        )
        .otherwise(F.lit(""))
    )
    return joined.withColumn("errors", err).filter(F.col("errors") != "")


def user_download_rollup(lineage: DataFrame, downloads: DataFrame) -> DataFrame:
    """The reference's user-level download counters (catchment.py:656-660:
    ``total_csvs_downloaded += 1``, ``last_csv_download_at = now``), derived
    set-oriented: one join + groupBy(user_id)."""
    terminal = ~F.col("status").isin("pending", "processing")
    ok = downloads.join(
        lineage.filter(terminal).select("run_id", "user_id"), "run_id", "inner"
    )
    return ok.groupBy("user_id").agg(
        F.count("*").alias("total_csvs_downloaded"),
        F.max("downloaded_at").alias("last_csv_download_at"),
    )


def status_percentages(lineage: DataFrame) -> DataFrame:
    """A8: per-status share, round(100*n/total, 1) guarded total>0."""
    counts = lineage.groupBy("status").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return counts.withColumn(
        "pct",
        F.when(total > 0, F.round(F.col("n") * 100.0 / total, 1)).otherwise(None),
    )
