"""Streaming execution mode: the readStream wrappers must reproduce the
batch event-time results (same expressions, different executor)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_imdb_classifier_spark.sources.readers import load_table
from big_data_imdb_classifier_spark.streaming import streams as ST

from .conftest import SF_SMOKE


def test_tumbling_stream_matches_batch(spark):
    ev_stream = ST.load_events_stream(spark, SF_SMOKE)
    got = ST.run_to_memory(
        spark,
        ST.tumbling_counts_stream(ev_stream),
        "t_tumbling",
        output_mode="complete",
    )

    ev_batch = load_table(spark, SF_SMOKE, "events")
    want = (
        ev_batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
    assert len(g) > 0


def test_session_window_stream_matches_batch_session_count(spark):
    ev_stream = ST.load_events_stream(spark, SF_SMOKE)
    got = ST.run_to_memory(
        spark,
        ST.session_window_stream(ev_stream),
        "t_sessions",
        output_mode="complete",
    )
    # native session_window (streaming) vs batch gaps-and-islands must
    # agree on sessions-per-user and total event counts
    from big_data_imdb_classifier_spark.plans import queries_events as QE

    batch = QE.event_sessionization(spark, SF_SMOKE)
    got_per_user = {
        (r.user_id, r.n): None
        for r in got.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("tot"))
        .collect()
    }
    want_per_user = {
        (r.user_id, r.n): None
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("tot"))
        .collect()
    }
    assert got_per_user == want_per_user


def test_dedup_stream_drops_duplicate_keys(spark):
    ev_stream = ST.load_events_stream(spark, SF_SMOKE)
    deduped = ST.dedup_stream(ev_stream, keys=["user_id", "event_type"])
    got = ST.run_to_memory(spark, deduped, "t_dedup", output_mode="append")

    ev_batch = load_table(spark, SF_SMOKE, "events")
    n_keys = ev_batch.select("user_id", "event_type").distinct().count()
    assert got.count() == n_keys
    assert got.select("user_id", "event_type").distinct().count() == n_keys


def test_stateful_running_totals_matches_batch(spark):
    """applyInPandasWithState custom operator: one availableNow batch →
    per-user totals must equal the batch groupBy."""
    ev_stream = ST.load_events_stream(spark, SF_SMOKE)
    got = ST.run_to_memory(
        spark,
        ST.running_user_totals_stream(ev_stream),
        "t_state_totals",
        output_mode="update",
    )
    ev_batch = load_table(spark, SF_SMOKE, "events")
    want = ev_batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("sum_value"),
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_to_parquet_sink_with_checkpoint(spark, tmp_path):
    """File-sink streaming: availableNow drain into a partitioned parquet
    sink with a checkpoint; a second start with the same checkpoint must
    be a no-op (exactly-once file sink semantics), not a duplicate."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        ev = ST.load_events_stream(spark, SF_SMOKE)
        q = (
            ev.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .partitionBy("day")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n_batch = load_table(spark, SF_SMOKE, "events").count()
    assert spark.read.parquet(out).count() == n_batch
    drain()  # same checkpoint, no new input -> no duplicates
    assert spark.read.parquet(out).count() == n_batch
