"""Progress-event stream — the Spark re-expression of the reference's SSE change feed.

Reference pipeline (SURVEY.md §2.8/§3.2): Postgres trigger fires on status *transition*
(backend/db/triggers.py:16 ``NEW.status != OLD.status``), maps status -> event type
(start/complete/update, triggers.py:21-25), fans out to per-subscriber queues, and the
SSE loop emits 30 s heartbeats and closes on terminal status.

Spark shape: batch jobs append JSON progress rows to an event directory (one file per
emission — the ``foreachBatch`` sink pattern); a Structured Streaming reader tails the
directory; the transition dedupe is a ``lag(status)`` comparison; event typing is the
same CASE; terminal detection stops the query.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("completed", T.IntegerType()),
        T.StructField("failed", T.IntegerType()),
        T.StructField("total", T.IntegerType()),
        T.StructField("emitted_at", T.DoubleType()),
    ]
)

TERMINAL_STATUSES = ("done", "partial", "failed")


class ProgressEmitter:
    """Writes one JSON-lines file per emission into the event directory (the
    'trigger' side).  Deterministic sequencing; no Spark required to emit."""

    def __init__(self, event_dir: str):
        self.event_dir = event_dir
        os.makedirs(event_dir, exist_ok=True)
        self._seq = 0

    def emit(self, run_id: int, status: str, completed: int = 0, failed: int = 0,
             total: int = 0, emitted_at: float | None = None) -> None:
        self._seq += 1
        row = {
            "run_id": run_id,
            "seq": self._seq,
            "status": status,
            "completed": completed,
            "failed": failed,
            "total": total,
            "emitted_at": emitted_at if emitted_at is not None else time.time(),
        }
        path = os.path.join(self.event_dir, f"evt_{self._seq:08d}_{uuid.uuid4().hex}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(row) + "\n")
        os.rename(tmp, path)  # atomic publish — the reader never sees partial files


def event_type_expr():
    """The trigger's CASE (backend/db/triggers.py:21-25): processing->start,
    done/partial/failed->complete, else update."""
    return (
        F.when(F.col("status") == "processing", F.lit("start"))
        .when(F.col("status").isin(*TERMINAL_STATUSES), F.lit("complete"))
        .otherwise(F.lit("update"))
    )


def transitions_only(events: DataFrame) -> DataFrame:
    """Status-transition dedupe: keep rows where status != lag(status) per run —
    the batch analog of the trigger's NEW.status != OLD.status guard."""
    w = Window.partitionBy("run_id").orderBy("seq")
    prev = F.lag("status").over(w)
    return (
        events.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("status")))
        .drop("_prev")
    )


def with_event_fields(events: DataFrame) -> DataFrame:
    """Adds event_type + progress percentage (A8 guard: total>0)."""
    pct = F.when(
        F.col("total") > 0, F.round(F.col("completed") * 100.0 / F.col("total"), 1)
    )
    return events.withColumn("event_type", event_type_expr()).withColumn("progress_pct", pct)


def read_progress_stream(spark: SparkSession, event_dir: str) -> DataFrame:
    """Structured Streaming source over the event directory."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 100)
        .json(event_dir)
    )


def run_progress_query(
    spark: SparkSession, event_dir: str, sink_table: str = "progress_events"
):
    """Start the streaming query: tail events -> typed/deduped -> in-memory sink.

    Heartbeat = trigger interval; callers poll the sink table and stop on terminal
    status (mirrors the SSE loop's complete/heartbeat handling).
    """
    stream = with_event_fields(read_progress_stream(spark, event_dir))
    return (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .trigger(processingTime="1 second")
        .start()
    )
