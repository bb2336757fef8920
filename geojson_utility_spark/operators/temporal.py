"""Temporal joins — the as-of join (point-in-time lookup) Spark SQL lacks natively.

``as_of_join(left, right, ...)``: for every left row, attach the single right row
with the greatest right timestamp <= the left timestamp within the same key —
the standard point-in-time enrichment (latest price before a trade, latest order
before an event).  Semantics match DuckDB's ``ASOF LEFT JOIN`` (the oracle).

Physical shape (scale-first): NO range join, NO per-key collect.  Both sides are
UNIONED with a side tag and processed by ONE window partitioned by key and ordered
by (ts, side): ``last(right_cols, ignorenulls=True)`` carries the most recent right
row forward onto each left row.  Cost = one shuffle on the key (keyed window, never
a global sort); right rows add O(|right|) rows to the shuffle, not a join blowup.
Right-side timestamp ties are resolved BEFORE the union by keeping the row with the
greatest tiebreaker per (key, ts) — making the result deterministic (DuckDB ASOF
requires the same uniqueness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreaker: str | None = None,
) -> DataFrame:
    """Left as-of join: left rows + the latest right row with right_ts <= left_ts.

    right_cols: the right-side payload columns to attach (null when no right row
    precedes the left row — LEFT-join semantics).
    tiebreaker: right column deciding among equal right_ts per key (greatest wins);
    required if (key, right_ts) is not unique.

    Name hygiene: the implementation reserves ``_ts``/``_side``/``_r`` internally and
    re-attaches ``right_cols`` under their original names — inputs colliding with
    either are rejected up front (silently wrong output otherwise).
    """
    reserved = {"_ts", "_side", "_r"}
    clash = reserved.intersection(left.columns)
    if clash:
        raise ValueError(
            f"as_of_join: left columns {sorted(clash)} collide with reserved "
            "internal names (_ts, _side, _r) — rename them before the join"
        )
    out_clash = set(right_cols).intersection(left.columns)
    if out_clash:
        raise ValueError(
            f"as_of_join: right_cols {sorted(out_clash)} collide with left columns "
            "— alias the right payload (e.g. right.withColumnRenamed) before the join"
        )
    if reserved.intersection(right_cols):
        raise ValueError(
            "as_of_join: right_cols may not use reserved names (_ts, _side, _r)"
        )
    if tiebreaker:
        w_dedup = Window.partitionBy(key, right_ts).orderBy(F.col(tiebreaker).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    # carry the payload as ONE struct: last(ignorenulls) must pick ALL columns from
    # the same (latest) right row — per-column carries would resurrect older values
    # wherever the matched row holds a NULL, fabricating a row that never existed
    r = right.select(
        F.col(key).alias(key),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),  # right rows sort BEFORE left rows at equal ts
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    left_cols = left.columns
    r_struct_type = dict(r.dtypes)["_r"]
    l = left.select(
        *left_cols,
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    unioned = l.select(
        key, "_ts", "_side", "_r", *[c for c in left_cols if c != key]
    ).unionByName(
        r.select(
            key, "_ts", "_side", "_r",
            *[F.lit(None).cast(dict(l.dtypes)[c]).alias(c) for c in left_cols if c != key],
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        key,
        "_side",
        *[c for c in left_cols if c != key],
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_r.{c}").alias(c) for c in right_cols],
    )
