"""Streaming windowed aggregation over the events stream.

The reference has no data windows (its stream is status events only, SURVEY.md §2.8);
the engine adds the standard Structured Streaming shapes a progress/metrics pipeline
needs at scale: watermarked tumbling/sliding window counts and per-run sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path_dir: str, max_files: int = 10) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path_dir)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling (or sliding) window: count + decimal-exact value sum per
    event_type.  Late rows beyond the watermark are dropped by the engine — the
    documented contrast to the reference's drop-on-full queue (§2.8)."""
    w = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_windowed_query(
    spark: SparkSession,
    path_dir: str,
    sink_table: str = "windowed_events",
    output_mode: str = "append",
    **kw,
) -> "StreamingQuery":  # noqa: F821
    """Start the windowed-count stream.

    ``output_mode='append'`` (default) is the only mode where the watermark does its
    job: a window is emitted exactly once, when the watermark passes its end, and its
    state is then EVICTED — bounded state for an unbounded stream, late rows beyond
    the watermark dropped.  ('complete' re-emits every window each trigger, ignores
    the watermark for eviction, and grows both state and a memory sink without bound
    — only suitable for small finite debugging feeds, so it is not the default.)

    Append-mode consequence a caller must know: a window stays unemitted until a
    LATER event advances the watermark past its end — a quiesced feed holds back its
    final windows until the next event arrives (tests advance it with a sentinel).
    """
    q = (
        windowed_counts(read_events_stream(spark, path_dir), **kw)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(sink_table)
        .start()
    )
    return q
