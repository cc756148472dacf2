"""Structured Streaming wrappers over the batch event-time expressions.

The batch queries in plans/queries_events.py define the semantics (and
carry the DuckDB oracles); these wrappers re-run the same expressions
under ``readStream`` with watermarks, so the streaming mode is a thin
execution-strategy swap, not a second implementation. Tests drive them
with ``trigger(availableNow=True)`` into a memory sink and diff against
the batch results (tests/test_streaming.py).

At scale: a watermark bounds state for the windowed aggregation and the
stateful dedup; the shuffle keys match the batch plans (window×type,
user_id) so the same partitioning/skew reasoning applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Streaming readers require an explicit schema. events.parquet stores
# TIMESTAMP(NANOS), which Spark only scans as nano-epoch longs (see
# sources/readers.py:load_table) — declare long, convert after the scan.
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one-file 'backlog';
    in production this is a directory the pipeline appends to)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # The file stream source requires a *directory*; select just the
    # events file out of the shared testdata dir with a glob filter.
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of event_window_tumbling: watermarked event-time
    windows × type. State is bounded by the watermark horizon."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (F.session_window) with a watermark — the
    streaming form of event_sessionization's gaps-and-islands."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Stateful streaming dedup: first event per key wins, state expired
    by the watermark (dropDuplicatesWithinWatermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def run_to_memory(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    output_mode: str = "complete",
    timeout_sec: int = 120,
) -> DataFrame:
    """Drain a (bounded) stream into an in-memory sink with availableNow
    and return the completed result as a batch DataFrame.

    ``complete`` for watermarked aggregations (a single availableNow batch
    never advances the watermark far enough for append-mode emission);
    ``append`` for stateless/dedup streams.
    """
    q = (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(table)


# ---------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_TOTALS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)
_TOTALS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("total", T.DoubleType(), True),
    ]
)


def running_user_totals_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) maintained across micro-batches, emitting the
    updated totals for every user seen in a batch.

    This is the escape hatch for stateful logic Spark's built-in
    aggregations can't express (per-key model state, custom eviction,
    cross-batch counters). State is per-key and partitioned by the group
    key, so it scales horizontally; the watermark bounds how long idle
    keys linger (NoTimeout here — the test drives one availableNow batch).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_TOTALS_OUT,
            stateStructType=_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
