"""Event-time queries over the ``events`` table (SURVEY.md §2.10).

Batch-first event-time processing: every aggregation here is a plain
group-by over ``F.window`` / ``date_trunc`` / ``from_json`` expressions,
which makes it DuckDB-oracle-checkable; the streaming execution mode is a
thin ``readStream`` wrapper over the same expressions
(big_data_imdb_classifier_spark/streaming/streams.py), exercised by
tests/test_streaming.py with an availableNow trigger.

Window-start timestamps are formatted to strings on BOTH sides (session
TZ is UTC) so tz-aware Spark values compare equal to DuckDB's naive ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.temporal import epoch_seconds
from ..sources.readers import load_table
from .registry import ROUND_DIGITS, format_doc, query

_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "event_window_tumbling",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_FMT_DUCK}') AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value,
           floor(round(sum(value), 2) / count(*) * 10000) / 10000 AS avg_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def event_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows × event_type: the §2.10 core.
    One shuffle on (window, type); partial aggregation map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            (F.floor(F.round(F.sum("value"), 2) / F.count("*") * 10000) / 10000).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "event_window_sliding",
    oracle=f"""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes') AS ws, value
      FROM events
    )
    SELECT strftime(ws, '{_FMT_DUCK}') AS window_start,
           count(*)::BIGINT AS n_events,
           floor(round(sum(value), 2) / count(*) * 10000) / 10000 AS avg_value
    FROM buckets GROUP BY 1 ORDER BY 1
    """,
)
def event_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour, 30-minute slide): each event lands in two
    overlapping windows — Spark's window() emits both; the oracle unions
    the two aligned bucket families."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (F.floor(F.round(F.sum("value"), 2) / F.count("*") * 10000) / 10000).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "n_events",
            "avg_value",
        )
        .orderBy("window_start")
    )


@query(
    "event_date_trunc_rollup",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '{_FMT_DUCK}') AS day,
           event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def event_date_trunc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-day rollup via date_trunc — the hypertable-style rollup
    shape (day × type)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), _FMT).alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "event_props_json",
    oracle=f"""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)),
                 {ROUND_DIGITS}) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           count(*) FILTER (json_extract_string(props, '$.k') IS NOT NULL)::BIGINT
             AS n_with_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (get_json_object on the props column) +
    per-type aggregation — semi-structured payload processing without a
    pre-parse pass."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), ROUND_DIGITS).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


@query(
    "event_sessionization",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL '30 minutes'
             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           strftime(min(ts), '{_FMT_DUCK}') AS session_start,
           strftime(max(ts), '{_FMT_DUCK}') AS session_end,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user, batch-first
    via gaps-and-islands: lag → new-session flag → running sum → agg.
    Two window passes + one agg over the same (user_id, ts) partitioning,
    so Catalyst plans a single sort-shuffle reused across all three.

    (Streaming-native F.session_window over the same data is exercised in
    tests/test_streaming.py; the gap semantics are identical.)
    """
    ev = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # The running sum orders by the SAME (ts, event_id) key as the lag
    # window: with duplicate (user_id, ts) rows an orderBy("ts")-only
    # cumulative sum would be partition-order dependent, making session
    # assignment nondeterministic (latent — no such duplicates in the
    # testdata — but determinism shouldn't rest on that).
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("ts").over(w_order)
    new_session = F.when(
        prev.isNull()
        | (epoch_seconds("ts") - epoch_seconds(prev) > 30 * 60),
        1,
    ).otherwise(0)
    sessions = ev.select(
        "user_id", "ts", "event_id", "value", new_session.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(w_cum))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), _FMT).alias("session_start"),
            F.date_format(F.max("ts"), _FMT).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "event_dedup_latest",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value,
        row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT user_id, event_type,
           strftime(ts, '{_FMT_DUCK}') AS last_ts,
           round(value, {ROUND_DIGITS}) AS last_value
    FROM ranked WHERE rk = 1 ORDER BY user_id, event_type
    """,
)
def event_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the latest event per (user, type) — the batch
    equivalent of streaming dropDuplicatesWithinWatermark with
    last-write-wins semantics; one window over one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", _FMT).alias("last_ts"),
            F.round("value", ROUND_DIGITS).alias("last_value"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "event_asof_last_purchase",
    oracle=f"""
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
    purchases AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '{_FMT_DUCK}') AS click_ts,
           strftime(p.ts, '{_FMT_DUCK}') AS last_purchase_ts
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts > p.ts
    ORDER BY c.event_id
    """,
)
def event_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent STRICTLY-prior
    purchase timestamp (union+window rewrite, one shuffle — see
    operators/relational.py:asof_join). The DuckDB oracle is a native
    ASOF LEFT JOIN, so the rewrite's semantics are hash-match pinned to
    the canonical definition."""
    from ..operators.relational import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    joined = asof_join(
        clicks,
        purchases.withColumn("purchase_ts", F.col("ts")),
        keys=["user_id"],
        ts_col="ts",
        carry=["purchase_ts"],
        strict=True,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT).alias("click_ts"),
        F.date_format("purchase_ts_asof", _FMT).alias("last_purchase_ts"),
    ).orderBy("event_id")


@query(
    "event_range_join_clicks_before_purchase",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{_FMT_DUCK}') AS purchase_ts,
           (SELECT count(*) FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id
              AND c.ts < p.ts AND c.ts > p.ts - INTERVAL '1 hour')::BIGINT
             AS n_clicks_1h
    FROM events p WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
)
def event_range_join_clicks_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range join: clicks in the hour before each purchase, per user —
    banded-bucket equi-join rewrite (operators/relational.py:
    range_join_count), hash-matched against DuckDB's correlated range
    count."""
    from ..operators.relational import range_join_count

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click")
    out = range_join_count(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lookback_sec=3600,
        count_col="n_clicks_1h",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT).alias("purchase_ts"),
        "n_clicks_1h",
    ).orderBy("event_id")


@query(
    "event_rolling_1h_user_sum",
    oracle=f"""
    SELECT event_id, user_id,
      strftime(ts, '{_FMT_DUCK}') AS ts_str,
      round(sum(value) OVER (
        PARTITION BY user_id ORDER BY epoch(ts)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
      ), 2) AS rolling_1h_sum
    FROM events
    ORDER BY event_id
    """,
)
def event_rolling_1h_user_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user rolling 1-hour value sum — the
    value-based frame (rangeBetween over epoch seconds) that rows-frames
    can't express when event spacing is irregular. One shuffle on
    user_id; frame evaluation is a sliding aggregate within the sorted
    partition."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_seconds("ts"))
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.date_format("ts", _FMT).alias("ts_str"),
            F.round(F.sum("value").over(w), 2).alias("rolling_1h_sum"),
        )
        .orderBy("event_id")
    )


@query(
    "event_ffill_gap_fill",
    oracle=f"""
    SELECT event_id, user_id,
           strftime(ts, '{_FMT_DUCK}') AS ts_str,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS last_purchase_value
    FROM events ORDER BY event_id
    """,
)
def event_ffill_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (gap fill): carry each user's most recent purchase
    value forward onto every subsequent event — ``last(..., ignorenulls)``
    over a running rows frame. The canonical sparse-to-dense repair for
    irregular time series; one shuffle on user_id, deterministic via the
    unique event_id ordering tiebreak. NULL before a user's first
    purchase (no fabricated data)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        ev.select(
            "event_id",
            "user_id",
            F.date_format("ts", _FMT).alias("ts_str"),
            F.round(
                F.last(purchase_val, ignorenulls=True).over(w), 2
            ).alias("last_purchase_value"),
        )
        .orderBy("event_id")
    )


@query(
    "user_event_type_profile",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, count(*)::BIGINT AS cnt
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           count(*)::INT AS n_types,
           coalesce(string_agg(event_type || '=' || cnt, ',' ORDER BY event_type)
                      FILTER (cnt >= 3), '') AS frequent_profile
    FROM per GROUP BY user_id ORDER BY user_id
    """,
)
def user_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per-user event-type counts folded into a
    MapType column (map_from_entries over sorted entries), filtered with
    the map_filter higher-order lambda (keep types seen >= 3 times), and
    rendered back through map_entries + transform. The map is built from
    a pre-aggregated (user x type) frame, so the shuffle moves counts,
    not events; all lambdas execute JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    frequent = F.map_filter("m", lambda k, v: v >= 3)
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.array_join(
            F.transform(
                F.map_entries(frequent),
                lambda e: F.concat(e.key, F.lit("="), e.value.cast("string")),
            ),
            ",",
        ).alias("frequent_profile"),
    ).orderBy("user_id")


@query(
    "event_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT count(DISTINCT user_id) FROM events)::BIGINT AS users_total,
           (SELECT count(*) FROM v)::BIGINT AS users_viewed,
           (SELECT count(*) FROM c)::BIGINT AS users_clicked_after_view,
           (SELECT count(*) FROM p)::BIGINT AS users_purchased_after_click
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user advances
    a stage only with an event STRICTLY AFTER their previous stage's first
    event (the product-analytics "funnel" operator; windowed variants are
    the same shape with a time-bound residual, cf. range_join_count).

    Three stage aggregations, each a groupBy(user) over a stage-filtered
    slice joined back on user_id; every join and aggregation hashes on
    the same user_id key, so AQE plans them as one co-partitioned chain
    (no broadcast of the big side; stage frames shrink monotonically).
    The final single-row summary crosses the tiny stage counts.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    totals = ev.agg(
        F.countDistinct("user_id").alias("users_total")
    )
    return (
        totals.crossJoin(v.agg(F.count("*").alias("users_viewed")))
        .crossJoin(c.agg(F.count("*").alias("users_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("users_purchased_after_click")))
    )


@query(
    "event_asof_next_purchase_1h",
    oracle=f"""
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
    purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
    cand AS (
      SELECT c.event_id, p.ts AS pts, p.value,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY p.ts, p.value DESC) AS rn
      FROM clicks c JOIN purchases p
        ON p.user_id = c.user_id AND p.ts > c.ts
       AND epoch(p.ts) - epoch(c.ts) <= 3600
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '{{fmt}}') AS click_ts,
           round(m.value, 4) AS next_purchase_value
    FROM clicks c LEFT JOIN (SELECT * FROM cand WHERE rn = 1) m
      ON m.event_id = c.event_id
    ORDER BY c.event_id
    """.replace("{fmt}", _FMT_DUCK),
)
def event_asof_next_purchase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: each click matched to the same
    user's nearest FOLLOWING purchase, nulled when it is more than one
    hour out — "did this click convert, and for how much?". Exercises
    the merge_asof-complete operator surface (direction='forward',
    tolerance_sec) on the union+window rewrite: still ONE shuffle on
    user_id, unlike the oracle's per-key range join whose candidate set
    explodes at scale. Ties on purchase timestamp resolve to the largest
    value (the operator's documented deterministic order, mirrored by
    the oracle's ``ORDER BY p.ts, p.value DESC``)."""
    from ..operators.relational import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        ts_col="ts",
        carry=["value"],
        strict=True,
        direction="forward",
        tolerance_sec=3600,
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT).alias("click_ts"),
        F.round("value_asof", 4).alias("next_purchase_value"),
    ).orderBy("event_id")


@query(
    "event_props_variant",
    oracle=f"""
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT
             AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)),
                 {ROUND_DIGITS}) AS avg_k,
           count(*) FILTER (json_extract_string(props, '$.k') IS NULL)::BIGINT
             AS n_missing_k,
           TRUE AS schema_uniform
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VariantType: one
    ``try_parse_json`` pass builds the binary variant encoding, typed
    fields come out via ``try_variant_get`` path expressions, and
    ``schema_of_variant`` powers an in-query drift check
    (``schema_uniform`` — more than one observed schema flips the
    boolean and fails the driver hash gate, the sketch-gate pattern).

    Versus string-path extraction (event_props_json): the variant is
    parsed ONCE per row and every field access is a binary offset read,
    which is the 100 TB answer when queries touch many fields of the
    same payload — and variant columns can be stored parsed (parquet
    variant shredding) so the parse disappears from the scan entirely.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    row = ev.select(
        "event_type",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.schema_of_variant(v).alias("vschema"),
    )
    return (
        row.groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), ROUND_DIGITS).alias("avg_k"),
            F.count_if(F.col("k").isNull()).alias("n_missing_k"),
            (F.count_distinct("vschema") <= 1).alias("schema_uniform"),
        )
        .orderBy("event_type")
    )


@query(
    "event_transition_matrix",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type, next_type, count(*)::BIGINT AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type, next_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY event_type),
                 {ROUND_DIGITS}) AS p
    FROM t ORDER BY event_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event paths:
    P(next event type | current type) — the "what do users do next"
    operator behind path/flow analysis. ``lead`` over (user, time) gives
    the bigrams in one pass; the matrix is tiny (|types|²), so the
    normalizing window runs on the already-reduced counts.

    Shuffle budget: one hash exchange on user_id for the sequence window,
    one on event_type for the count — the 5x5 output makes everything
    after the first aggregation negligible at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    norm = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(norm), ROUND_DIGITS).alias("p"),
    ).orderBy("event_type", "next_type")


@query(
    "event_session_concurrency",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL '30 minutes'
             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    ),
    sess AS (
      SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
      FROM numbered GROUP BY user_id, session_id
    ),
    deltas AS (
      SELECT s_start AS ts, 1 AS d FROM sess
      UNION ALL SELECT s_end, -1 FROM sess
    ),
    per_ts AS (
      SELECT ts, count(*) FILTER (d = 1) AS pos, sum(d) AS net
      FROM deltas GROUP BY ts
    ),
    cum AS (
      SELECT ts, pos, net,
        sum(net) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS c
      FROM per_ts
    )
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(max(c - net + pos) AS BIGINT) AS peak_concurrency,
           CAST(sum(pos) AS BIGINT) AS sessions_started
    FROM cum GROUP BY 1 ORDER BY 1
    """,
)
def event_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval sweep-line: peak number of SIMULTANEOUSLY open sessions
    per day (sessions = the same 30-minute-gap islands as
    event_sessionization). The load-profile query behind capacity
    planning and concurrency licensing — an interval-overlap aggregate
    computed without ever enumerating the O(n²) overlapping pairs.

    Scale shape — a DISTRIBUTED PREFIX SUM, not a global window: each
    session emits (+1 at start, −1 at end); deltas reduce per timestamp;
    then the running count factors into (a) per-day partial sums rolled
    up ahead of time and cumulated in a window over the ~150-row day
    frame (the only unpartitioned window, bounded by calendar size, like
    pack_sequences_contiguous' bin offsets), plus (b) a within-day
    running sum partitioned by day. Concurrency at ts counts a +1 and a
    −1 touching at the same instant as concurrent (c − net + pos), which
    also makes the result independent of within-timestamp ordering —
    required for cross-engine determinism."""
    ev = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # (ts, event_id) cumulative ordering matches w_order — deterministic
    # session ids under timestamp ties (see event_sessionization).
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("ts").over(w_order)
    new_session = F.when(
        prev.isNull()
        | (epoch_seconds("ts") - epoch_seconds(prev) > 30 * 60),
        1,
    ).otherwise(0)
    sess = (
        ev.select("user_id", "ts", "event_id", new_session.alias("new_session"))
        .withColumn("session_id", F.sum("new_session").over(w_cum))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    from ..operators.relational import interval_concurrency_profile

    profile = interval_concurrency_profile(sess, "s_start", "s_end")
    return profile.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "peak_concurrency",
        F.col("intervals_started").alias("sessions_started"),
    ).orderBy("day")


# Coarse cogroup-key fan-in: each applyInPandas call handles one bucket
# of users, amortizing the ~9 ms/call Python-invoke overhead that made a
# per-user grouping 14 s at sf0.1. 64 buckets ≈ 2× local task slots.
_ATTRIB_BUCKETS = 64


@query(
    "cogroup_click_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, ts,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    per_purchase AS (
      SELECT p.user_id,
        (SELECT count(*) FROM c
          WHERE c.user_id = p.user_id AND c.ts < p.ts
            AND (p.prev_ts IS NULL OR c.ts >= p.prev_ts)) AS n_attrib
      FROM p
    )
    SELECT user_id,
      count(*)::BIGINT AS n_purchases,
      CAST(sum(n_attrib) AS BIGINT) AS attributed_clicks,
      max(n_attrib)::BIGINT AS max_interval_clicks
    FROM per_purchase GROUP BY user_id ORDER BY user_id
    """,
)
def cogroup_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-interval click attribution via the COGROUPED-MAP extension
    point (``groupBy().cogroup().applyInPandas``): per user, each
    purchase is credited with the clicks since the previous purchase
    (clicks at or after the prior purchase's timestamp, strictly before
    this one) — the marketing-attribution primitive. Per-user rollup:
    purchases, total attributed clicks, busiest interval.

    Why cogroup: the per-user logic consumes TWO differently-shaped
    streams (all clicks, all purchases) at once — as a join it's the
    O(clicks × purchases)-per-user range join (the banded rewrite exists:
    event_range_join...); as cogroup each side shuffles ONCE and a
    vectorized searchsorted does the interval assignment per user in
    O((C+P) log P). This completes the Python-boundary surface:
    scalar/grouped-agg pandas_udf, applyInPandas, mapInPandas,
    mapInArrow, UDTF, and cogrouped-map.

    Scale shape — COARSE cogroup keys: grouping on raw user_id calls
    Python once per user (~9 ms/call of Arrow+invoke overhead made the
    full corpus 14 s at sf0.1 in round 3), so the cogroup key is a
    user-id BUCKET (user_id % {_ATTRIB_BUCKETS}); each Python call
    amortizes its overhead across a batch of users and the per-user
    work inside the batch is numpy. Bucketing by a pure function of the
    original key keeps all of a user's rows in one group, so semantics
    are unchanged at any bucket count — tune bucket count ≈ a few × the
    cluster's task slots at 100 TB.

    Cross-engine determinism: interval edges compare raw timestamps
    (no FP); numpy searchsorted side='left' reproduces the strict-< / ≥
    edge semantics of the correlated-subquery oracle."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    # EVERY per-side column name is made unique (c_uid/c_ts vs
    # p_uid/p_ts): both sides derive from the same scan, and sharing an
    # attribute across the cogroup children can get one side's copy
    # pruned away (the Python function's column use is invisible to the
    # optimizer — observed live: the purchases side arrived without
    # user_id when both sides carried the same user_id attribute).
    bucket = F.pmod(F.col("user_id"), F.lit(_ATTRIB_BUCKETS)).alias("b")
    clicks = ev.where(F.col("event_type") == "click").select(
        bucket, F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        bucket, F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_eid"),
    )

    def attribute(key, cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_purchases", "attributed_clicks",
                "max_interval_clicks"]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        # one sorted click array per user in this bucket
        csorted = {
            u: np.sort(g["c_ts"].to_numpy())
            for u, g in cdf.groupby("c_uid", sort=False)
        }
        users, n_p, n_att, n_max = [], [], [], []
        for u, g in pdf.groupby("p_uid", sort=False):
            p = g.sort_values(["p_ts", "p_eid"], kind="mergesort")
            pts = p["p_ts"].to_numpy()
            cts = csorted.get(u)
            if cts is None:
                cts = np.array([], dtype=pts.dtype)
            # clicks strictly before this purchase...
            hi = np.searchsorted(cts, pts, side="left")
            # ...and at-or-after the previous purchase (first interval:
            # everything earlier)
            prev = np.concatenate(([np.datetime64("1900-01-01")], pts[:-1]))
            lo = np.searchsorted(cts, prev, side="left")
            n_attrib = hi - lo
            users.append(int(u))
            n_p.append(len(pts))
            n_att.append(int(n_attrib.sum()))
            n_max.append(int(n_attrib.max()))
        return pd.DataFrame(
            {"user_id": users, "n_purchases": n_p,
             "attributed_clicks": n_att, "max_interval_clicks": n_max}
        )

    out = (
        clicks.groupBy("b")
        .cogroup(purchases.groupBy("b"))
        .applyInPandas(
            attribute,
            "user_id long, n_purchases long, attributed_clicks long, "
            "max_interval_clicks long",
        )
    )
    return out.orderBy("user_id")


_TS_QUERY_USER = 0
_TS_MIN_OVERLAP = 20
_TS_TOP_K = 10


@query(
    "ts_user_similarity_corr",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
      FROM events GROUP BY 1, 2
    ),
    q AS (SELECT day, v AS qv FROM daily WHERE user_id = {_TS_QUERY_USER}),
    sims AS (
      SELECT d.user_id, corr(d.v, q.qv) AS c,
             count(*)::BIGINT AS n_days
      FROM daily d JOIN q ON d.day = q.day
      WHERE d.user_id <> {_TS_QUERY_USER}
      GROUP BY d.user_id
      HAVING count(*) >= {_TS_MIN_OVERLAP}
    )
    SELECT user_id, round(c, {ROUND_DIGITS}) AS sim, n_days
    FROM sims
    ORDER BY round(c, {ROUND_DIGITS}) DESC, user_id
    LIMIT {_TS_TOP_K}
    """,
)
def ts_user_similarity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-SERIES similarity search (the distributed-streams shape of
    EDBT'19-style similarity search, on aligned calendar buckets):
    which users' daily activity profiles correlate most with a query
    user's? Series are day-aggregated per user, aligned by joining on
    the calendar day, scored with Pearson correlation as a single
    aggregate, overlap-gated (≥ 20 shared days — correlation over a
    handful of points is noise), and top-k'd.

    Scale shape: the daily reduce is a (user, day) partial+final hash
    aggregate; the query user's series is one row per day — a broadcast
    — so every candidate's score costs one pass over its OWN daily rows
    (no user×user pair blowup: candidate scoring is embarrassingly
    parallel over users). Ordering on the ROUNDED score keeps the top-k
    cutoff deterministic across engines' corr() accumulation orders."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum("value").alias("v"))
    q = daily.where(F.col("user_id") == _TS_QUERY_USER).select(
        "day", F.col("v").alias("qv")
    )
    sims = (
        daily.where(F.col("user_id") != _TS_QUERY_USER)
        .join(F.broadcast(q), "day")
        .groupBy("user_id")
        .agg(
            F.corr("v", "qv").alias("c"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .where(F.col("n_days") >= _TS_MIN_OVERLAP)
    )
    return (
        sims.select(
            "user_id", F.round("c", ROUND_DIGITS).alias("sim"), "n_days"
        )
        .orderBy(F.desc("sim"), F.asc("user_id"))
        .limit(_TS_TOP_K)
    )


@query(
    "event_retention_cohorts",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
        CAST(datediff('week', f.cohort, date_trunc('week', e.ts)) AS BIGINT)
          AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    ),
    cohort_size AS (
      SELECT cohort, count(*) AS n0 FROM first_seen GROUP BY cohort
    )
    SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort,
      a.week_offset,
      count(*)::BIGINT AS n_active,
      round(count(*) * 1.0 / any_value(s.n0), {ROUND_DIGITS})
        AS retention
    FROM activity a JOIN cohort_size s ON a.cohort = s.cohort
    GROUP BY a.cohort, a.week_offset
    ORDER BY cohort, week_offset
    """,
)
def event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics rollup:
    users grouped by first-seen week, and for every (cohort, weeks-since)
    cell the count and fraction of the cohort still active. Output is
    the triangle a retention heatmap plots.

    Scale shape: first-seen is one user-keyed aggregate; activity
    dedup (user, week) rides the SAME user partitioning through the
    cohort join (co-partitioned, no extra exchange); cohort sizes are a
    weeks-sized frame folded back by broadcast. Everything after the
    per-user reduce operates on (user × active-week) rows — the corpus
    is scanned once."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("w"))
        .join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort",
            (F.datediff(F.col("w"), F.col("cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    cohort_size = first_seen.groupBy("cohort").agg(F.count("*").alias("n0"))
    return (
        activity.join(F.broadcast(cohort_size), "cohort")
        .groupBy("cohort", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.round(
                F.count(F.lit(1)) / F.any_value("n0"), ROUND_DIGITS
            ).alias("retention"),
        )
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "week_offset",
            "n_active",
            "retention",
        )
        .orderBy("cohort", "week_offset")
    )


@query(
    "user_rfm_segments",
    oracle=f"""
    WITH mx AS (SELECT max(ts) AS now FROM events),
    rfm AS (
      SELECT user_id,
        CAST(datediff('day', max(ts), (SELECT now FROM mx)) AS BIGINT) AS r,
        count(*) AS f,
        sum(value) AS m
      FROM events GROUP BY user_id
    ),
    cuts AS (
      SELECT quantile_cont(r, [1.0/3, 2.0/3]) AS rc,
             quantile_cont(f, [1.0/3, 2.0/3]) AS fc,
             quantile_cont(m, [1.0/3, 2.0/3]) AS mc
      FROM rfm
    )
    SELECT
      len(list_filter(rc, x -> r > x)) AS r_seg,
      len(list_filter(fc, x -> f > x)) AS f_seg,
      len(list_filter(mc, x -> m > x)) AS m_seg,
      count(*)::BIGINT AS n_users,
      round(avg(m), {ROUND_DIGITS}) AS mean_monetary
    FROM rfm, cuts
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value rollup: per user,
    Recency (days since last event, against the corpus max), Frequency
    (event count), Monetary (summed value); each dimension cut into
    terciles at EXACT interpolated percentiles and users counted per
    (r, f, m) segment cell. Explicit percentile boundaries instead of
    ntile(): ntile breaks ties by row order (nondeterministic across
    partitionings/engines), while a threshold comparison sends every
    tied user to the same side everywhere.

    Scale shape: one user-keyed reduce builds the RFM frame; the six
    cut points are ONE percentile aggregate broadcast back as a 1-row
    frame (same shape as histogram_equidepth_price); segmentation is a
    pure projection and the final rollup groups ≤ 27 cells."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("now"))
    rfm = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(F.any_value("now"), F.max("ts"))
            .cast("long")
            .alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum("value").alias("m"),
        )
    )
    thirds = F.array(F.lit(1.0 / 3), F.lit(2.0 / 3))
    cuts = rfm.agg(
        F.percentile("r", thirds).alias("rc"),
        F.percentile("f", thirds).alias("fc"),
        F.percentile("m", thirds).alias("mc"),
    )
    seg = lambda col, cut: F.size(  # noqa: E731
        F.filter(F.col(cut), lambda x: F.col(col) > x)
    )
    return (
        rfm.crossJoin(F.broadcast(cuts))
        .groupBy(
            seg("r", "rc").alias("r_seg"),
            seg("f", "fc").alias("f_seg"),
            seg("m", "mc").alias("m_seg"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("m"), ROUND_DIGITS).alias("mean_monetary"),
        )
        .orderBy("r_seg", "f_seg", "m_seg")
    )


_ANOM_CUT = 3.0
_ANOM_K = 1.4826  # MAD consistency constant (as stats_mad_outliers)
# Degenerate-MAD floor: integer counts make any real MAD ≥ 0.5, so 1e-9
# only ever replaces an exact 0 (uniform volume) — keeps the cut and
# robust_z finite and engine-identical instead of dividing by zero.
_ANOM_EPS = 1e-9


@query(
    "event_daily_anomalies",
    oracle=f"""
    WITH daily0 AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS n0
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT day,
        n0 * CASE WHEN extract(day FROM day) = 1 THEN 5 ELSE 1 END AS n,
        extract(day FROM day) = 1 AS injected
      FROM daily0
    ),
    med AS (SELECT quantile_cont(n, 0.5) AS med_n FROM daily),
    mad AS (
      SELECT quantile_cont(abs(n - (SELECT med_n FROM med)), 0.5) AS mad_n
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n::BIGINT AS n_events,
      injected,
      round(abs(n - (SELECT med_n FROM med))
            / ({_ANOM_K} * greatest((SELECT mad_n FROM mad), {_ANOM_EPS})),
            {ROUND_DIGITS})
        AS robust_z
    FROM daily
    WHERE abs(n - (SELECT med_n FROM med))
          > {_ANOM_CUT} * {_ANOM_K}
            * greatest((SELECT mad_n FROM mad), {_ANOM_EPS})
    ORDER BY day
    """,
)
def event_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust time-series anomaly detection on the daily event volume:
    days whose counts sit more than 3 robust-z (MAD-scaled, 50%
    breakdown point — the estimator the outliers themselves can't drag,
    same as stats_mad_outliers) from the median. The monitoring query
    behind ingest alerting: a collapsed feed or duplicate-delivery storm
    shows up here before it poisons training data downstream.

    The synthetic corpus has a deliberately UNIFORM daily volume (zero
    natural anomalies at every SF), so the query plants deterministic
    5× spikes on first-of-month days and proves the detector flags
    exactly those (``injected`` rides along; every returned row must
    carry it TRUE) — the same inject-then-verify harness as
    text_pii_redact. The MAD estimator is what makes the proof
    meaningful: ~5 planted spikes in ~150 days would already drag a
    mean/stddev z-score's own baseline.

    Scale shape: the daily reduce is the only pass over the corpus; the
    median/MAD statistics aggregate the days-sized frame twice and fold
    back as broadcast scalars (calendar-bounded, like the sweep-line's
    day frame)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n0"))
        .select(
            "day",
            (
                F.col("n0")
                * F.when(F.dayofmonth("day") == 1, 5).otherwise(1)
            ).alias("n"),
            (F.dayofmonth("day") == 1).alias("injected"),
        )
    )
    med = daily.agg(F.percentile("n", F.lit(0.5)).alias("med_n"))
    with_med = daily.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.percentile(F.abs(F.col("n") - F.col("med_n")), F.lit(0.5)).alias(
            "mad_n"
        )
    )
    dev = F.abs(F.col("n") - F.col("med_n"))
    # Degenerate-MAD guard (mirrored in the oracle): a perfectly uniform
    # daily volume gives mad_n = 0, where an unguarded cut collapses to
    # dev > 0 and robust_z divides by zero — Spark and DuckDB disagree
    # on inf/NULL semantics, so the epsilon keeps both engines finite
    # and identical. Counts are integers, so any genuine MAD is ≥ 0.5
    # and the epsilon never distorts a real signal.
    mad_safe = F.greatest(F.col("mad_n"), F.lit(_ANOM_EPS))
    return (
        with_med.crossJoin(F.broadcast(mad))
        .where(dev > _ANOM_CUT * _ANOM_K * mad_safe)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").alias("n_events"),
            "injected",
            F.round(dev / (_ANOM_K * mad_safe), ROUND_DIGITS).alias(
                "robust_z"
            ),
        )
        .orderBy("day")
    )


_AB_Z_CRIT = 1.96  # two-sided 95%
_AB_EPS = 1e-12  # degenerate-variance guard, mirrored in the oracle


@query(
    "event_ab_test",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
        CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 8)) AS BIGINT) % 2
          AS arm,
        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT
        count(*) FILTER (arm = 0)::BIGINT AS n_control,
        count(*) FILTER (arm = 1)::BIGINT AS n_treatment,
        sum(conv) FILTER (arm = 0)::BIGINT AS conv_control,
        sum(conv) FILTER (arm = 1)::BIGINT AS conv_treatment
      FROM per_user
    ),
    calc AS (
      SELECT *,
        conv_control * 1.0 / greatest(n_control, 1) AS p0,
        conv_treatment * 1.0 / greatest(n_treatment, 1) AS p1,
        (conv_control + conv_treatment) * 1.0
          / greatest(n_control + n_treatment, 1) AS pp
      FROM arms
    ),
    z AS (
      SELECT *,
        (p1 - p0) / greatest(
          sqrt(pp * (1 - pp) * (1.0 / n_control + 1.0 / n_treatment)),
          {_AB_EPS}) AS zval
      FROM calc
    )
    SELECT n_control, n_treatment, conv_control, conv_treatment,
      round(p0, {ROUND_DIGITS}) AS cvr_control,
      round(p1, {ROUND_DIGITS}) AS cvr_treatment,
      round(p1 - p0, {ROUND_DIGITS}) AS lift,
      round(zval, {ROUND_DIGITS}) AS z_score,
      abs(zval) >= {_AB_Z_CRIT} AS significant
    FROM z
    """,
)
def event_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic 50/50 hash assignment of
    users to arms (same md5-bucket predicate as sample_by_hash — no RNG,
    so assignment is reproducible and joinable across tables), per-user
    conversion = any 'purchase' event, then the two-proportion pooled
    z-test a growth/experimentation platform computes — per-arm users,
    conversions, conversion rates, absolute lift, z-score, and the
    two-sided 95% significance verdict.

    The synthetic arms are exchangeable by construction, so the expected
    readout is a NON-significant lift — the gate pins the whole
    closed-form inference chain (pooled variance, epsilon-guarded SE) to
    the oracle either way.

    Scale shape: one user-keyed groupBy (map-side partial max absorbs
    per-user event mass) then a single-row conditional aggregate;
    nothing driver-side, no joins. The z arithmetic mirrors the oracle
    expression-for-expression (same association order) so IEEE division
    and sqrt land on identical doubles before the defensive round."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .withColumn(
            "arm",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            ),
        )
    )
    arm0 = F.col("arm") == 0
    arms = per_user.agg(
        F.count(F.when(arm0, 1)).alias("n_control"),
        F.count(F.when(~arm0, 1)).alias("n_treatment"),
        F.sum(F.when(arm0, F.col("conv"))).alias("conv_control"),
        F.sum(F.when(~arm0, F.col("conv"))).alias("conv_treatment"),
    )
    # greatest(n, 1) guards the degenerate empty-arm case (mirrored in
    # the oracle): double division by zero is NULL on Spark but IEEE inf
    # on DuckDB, which would break the hash gate. With an empty arm the
    # conv_* sum is NULL on both engines, so every downstream column
    # NULL-propagates identically instead of diverging.
    calc = arms.withColumns(
        {
            "p0": F.col("conv_control")
            * 1.0
            / F.greatest(F.col("n_control"), F.lit(1)),
            "p1": F.col("conv_treatment")
            * 1.0
            / F.greatest(F.col("n_treatment"), F.lit(1)),
            "pp": (F.col("conv_control") + F.col("conv_treatment"))
            * 1.0
            / F.greatest(
                F.col("n_control") + F.col("n_treatment"), F.lit(1)
            ),
        }
    )
    zval = (F.col("p1") - F.col("p0")) / F.greatest(
        F.sqrt(
            F.col("pp")
            * (1 - F.col("pp"))
            * (1.0 / F.col("n_control") + 1.0 / F.col("n_treatment"))
        ),
        F.lit(_AB_EPS),
    )
    return calc.withColumn("zval", zval).select(
        "n_control",
        "n_treatment",
        "conv_control",
        "conv_treatment",
        F.round("p0", ROUND_DIGITS).alias("cvr_control"),
        F.round("p1", ROUND_DIGITS).alias("cvr_treatment"),
        F.round(F.col("p1") - F.col("p0"), ROUND_DIGITS).alias("lift"),
        F.round("zval", ROUND_DIGITS).alias("z_score"),
        (F.abs(F.col("zval")) >= _AB_Z_CRIT).alias("significant"),
    )


_ACF_MAX_LAG = 7


@query(
    "event_ts_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts)::DATE AS day, count(*)::DOUBLE AS v
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1}))::INT AS lag),
    pairs AS (
      SELECT l.lag, a.v AS va, b.v AS vb
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.day = a.day + l.lag
    )
    SELECT lag, count(*)::BIGINT AS n_pairs,
           round(corr(va, vb), {ROUND_DIGITS}) AS acf
    FROM pairs GROUP BY lag ORDER BY lag
    """,
)
def event_ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-volume series at lags
    1..7 — the seasonality probe behind forecasting and anomaly
    dashboards (a weekly cycle shows up as a lag-7 peak). Pearson
    correlation between the series and its k-day shift, computed as a
    self-equi-join on the day key rather than a variable-offset window
    (neither engine supports lead(v, k) with a column offset, and the
    join form keeps both sides expression-identical).

    Scale shape: the raw corpus collapses to ONE row per calendar day
    before anything quadratic-looking happens, so the join is over a
    calendar-bounded frame (~150 rows × 7 lags) — same bounded-domain
    argument as event_session_concurrency's day frame. Both join sides
    broadcast; corr() is a single partial+final aggregate per lag."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("v")
    )
    lag_arr = F.array(
        *[F.lit(k).cast("int") for k in range(1, _ACF_MAX_LAG + 1)]
    )
    # explode a literal lag array (no cross join → no nested-loop plan);
    # the fan-out is 7× a calendar-bounded frame.
    a = daily.withColumn("lag", F.explode(lag_arr)).alias("a")
    b = daily.alias("b")
    pairs = a.join(
        F.broadcast(b),
        F.col("b.day") == F.date_add(F.col("a.day"), F.col("lag")),
    ).select("lag", F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.corr("va", "vb"), ROUND_DIGITS).alias("acf"),
        )
        .orderBy("lag")
    )


@query(
    "event_weekday_seasonality",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts)::DATE AS day, count(*)::DOUBLE AS v
      FROM events GROUP BY 1
    ),
    by_dow AS (
      SELECT dayofweek(day) AS dow, strftime(day, '%A') AS day_name,
             count(*)::BIGINT AS n_days, avg(v) AS avg_volume
      FROM daily GROUP BY 1, 2
    ),
    overall AS (SELECT avg(v) AS g FROM daily)
    SELECT dow, day_name, n_days,
           round(avg_volume, {ROUND_DIGITS}) AS avg_volume,
           round(avg_volume / (SELECT g FROM overall),
                 {ROUND_DIGITS}) AS seasonal_index
    FROM by_dow ORDER BY dow
    """,
)
def event_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal indices of event volume — avg daily volume per
    day-of-week over the global daily average, the multiplicative
    seasonality table behind seasonal-naive forecasting and staffing
    dashboards (pairs with event_ts_autocorrelation: the ACF detects a
    weekly cycle, this quantifies it per day).

    Scale shape: the corpus collapses to one row per calendar day
    first; the weekday aggregate runs over that bounded frame, and the
    global mean folds in as a broadcast scalar (same cross-scalar join
    pattern as heavy_hitters_suppkey) — two tiny aggregates after one
    distributed scan. Day-of-week is normalized to DuckDB's 0=Sunday
    convention (Spark's dayofweek is 1=Sunday..7)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("v")
    )
    by_dow = daily.groupBy(
        (F.dayofweek("day") - 1).alias("dow"),
        F.date_format("day", "EEEE").alias("day_name"),
    ).agg(
        F.count("*").alias("n_days"),
        F.avg("v").alias("avg_volume_raw"),
    )
    overall = daily.agg(F.avg("v").alias("g"))
    return (
        by_dow.crossJoin(F.broadcast(overall))
        .select(
            "dow",
            "day_name",
            "n_days",
            F.round("avg_volume_raw", ROUND_DIGITS).alias("avg_volume"),
            F.round(
                F.col("avg_volume_raw") / F.col("g"), ROUND_DIGITS
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


_BASKET_MIN_SUPPORT = 5  # min co-occurring users per pair


@query(
    "basket_pair_lift",
    oracle=f"""
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    n_users AS (SELECT count(DISTINCT user_id) AS n FROM ui),
    item_n AS (SELECT item, count(*)::BIGINT AS n_item FROM ui GROUP BY 1),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS n_both
      FROM ui a JOIN ui b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING count(*) >= {_BASKET_MIN_SUPPORT}
    )
    SELECT item_a, item_b, n_both,
      round(n_both * 1.0 / (SELECT n FROM n_users), {ROUND_DIGITS})
        AS support,
      round(n_both * 1.0 / ia.n_item, {ROUND_DIGITS}) AS confidence,
      round(n_both * 1.0 * (SELECT n FROM n_users)
            / (ia.n_item * ib.n_item), {ROUND_DIGITS}) AS lift
    FROM pairs
    JOIN item_n ia ON ia.item = item_a
    JOIN item_n ib ON ib.item = item_b
    ORDER BY lift DESC, item_a, item_b
    LIMIT 50
    """,
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise market-basket analysis (frequent-itemset mining at
    k=2): support / confidence / lift for item pairs co-occurring in
    the same user's event stream (item = props JSON key), top-50 by
    lift. The association-rules readout behind recommendations and
    merchandising — and the pair-counting shape every co-occurrence
    engine (including the co-purchase graph here) reduces to.

    Scale shape: distinct (user, item) FIRST (one reduce — caps any
    user's contribution at the item-vocabulary size), then the pair
    fan-out via a within-user self-equi-join on user_id with a.item <
    b.item (each user contributes C(items,2) pairs, bounded by vocab²,
    NOT by event count); pair counts reduce map-side; item marginals
    and the user total fold in as one broadcast join + one broadcast
    scalar. A min-support HAVING prunes the tail before the marginals
    join. Top-50 compiles to TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    ui = (
        ev.select("user_id", k.alias("item"))
        .where(F.col("item").isNotNull())
        .distinct()
    )
    n_users = ui.agg(
        F.countDistinct("user_id").alias("n_total")
    )
    item_n = ui.groupBy("item").agg(F.count("*").alias("n_item"))
    a, b = ui.alias("a"), ui.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"),
            F.col("b.item").alias("item_b"),
        )
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= _BASKET_MIN_SUPPORT)
    )
    ia = item_n.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    ib = item_n.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "item_a",
            "item_b",
            "n_both",
            F.round(
                F.col("n_both") * 1.0 / F.col("n_total"), ROUND_DIGITS
            ).alias("support"),
            F.round(
                F.col("n_both") * 1.0 / F.col("n_a"), ROUND_DIGITS
            ).alias("confidence"),
            F.round(
                F.col("n_both") * 1.0 * F.col("n_total")
                / (F.col("n_a") * F.col("n_b")),
                ROUND_DIGITS,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "item_a", "item_b")
        .limit(50)
    )


@query(
    "event_time_to_convert",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT date_diff('second', first_view, first_purchase) AS delay_s
      FROM per_user
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view
    )
    SELECT
      CASE WHEN delay_s < 3600 THEN 'lt_1h'
           WHEN delay_s < 86400 THEN '1h_24h'
           WHEN delay_s < 604800 THEN '1d_7d'
           ELSE 'ge_7d' END AS band,
      count(*)::BIGINT AS n_users,
      round(avg(delay_s), {ROUND_DIGITS}) AS avg_delay_s,
      min(delay_s)::BIGINT AS min_delay_s,
      max(delay_s)::BIGINT AS max_delay_s
    FROM conv GROUP BY 1 ORDER BY 1
    """,
)
def event_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from a user's FIRST view
    to their FIRST subsequent purchase, banded into the product-
    analytics buckets (<1h, 1h-24h, 1d-7d, ≥7d) with per-band count and
    avg/min/max delay — the latency companion to the ordered-stage
    funnel (event_funnel_conversion counts WHO converts; this measures
    HOW FAST).

    Scale shape: ONE user-keyed groupBy with conditional min aggregates
    (map-side partials absorb per-user event mass — never a window over
    raw events), a null/ordering filter, then a 4-row band aggregate.
    Two shuffles total, the second over four groups."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("first_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    conv = per_user.where(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            epoch_seconds("first_purchase") - epoch_seconds("first_view")
        ).alias("delay_s")
    )
    band = (
        F.when(F.col("delay_s") < 3600, "lt_1h")
        .when(F.col("delay_s") < 86400, "1h_24h")
        .when(F.col("delay_s") < 604800, "1d_7d")
        .otherwise("ge_7d")
    )
    return (
        conv.groupBy(band.alias("band"))
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("delay_s"), ROUND_DIGITS).alias("avg_delay_s"),
            F.min("delay_s").cast("long").alias("min_delay_s"),
            F.max("delay_s").cast("long").alias("max_delay_s"),
        )
        .orderBy("band")
    )


_CUSUM_REF_DAYS = 14   # reference window: days 1..14 set the baseline
_CUSUM_SHIFT_DOM = 20  # inject a +20% level shift from this day-of-month
_CUSUM_K = 0.5         # allowance, in sigma units
_CUSUM_H = 4.0         # decision threshold, in sigma units
_CUSUM_EPS = 1e-9      # degenerate-variance floor, mirrored in the oracle
_CUSUM_MIDR = 6        # intermediate rounding pins FP cross-engine


@query(
    "event_cusum_changepoint",
    oracle=f"""
    WITH daily0 AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS n0
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT day,
        n0 + CASE WHEN extract(day FROM day) >= {_CUSUM_SHIFT_DOM}
                  THEN CAST(floor(n0 / 5.0) AS BIGINT) ELSE 0 END AS n,
        extract(day FROM day) >= {_CUSUM_SHIFT_DOM} AS shifted,
        row_number() OVER (ORDER BY day) AS i
      FROM daily0
    ),
    ref AS (
      SELECT round(avg(n), {_CUSUM_MIDR}) AS mu0,
             round(greatest(stddev_samp(n), {_CUSUM_EPS}), {_CUSUM_MIDR})
               AS sigma0
      FROM daily WHERE i <= {_CUSUM_REF_DAYS}
    ),
    dev AS (
      SELECT day, n, shifted, mu0, sigma0,
        sum(n - mu0 - {_CUSUM_K} * sigma0)
          OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS c
      FROM daily CROSS JOIN ref
    ),
    cs AS (
      SELECT day, n, shifted, sigma0,
        c - least(min(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 0)
          AS s_pos
      FROM dev
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n::BIGINT AS n_events,
           shifted, round(s_pos, {ROUND_DIGITS}) AS cusum,
           s_pos > {_CUSUM_H} * sigma0 AS alarm
    FROM cs ORDER BY day
    """,
)
def event_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection on the daily event volume — the
    sequential changepoint monitor (Page's test) that catches a SUSTAINED
    drift the per-day MAD detector (event_daily_anomalies) is blind to:
    each day sits within its own z-band, but the cumulative excess over
    the baseline mean grows linearly and crosses the decision threshold.

    Same inject-then-verify harness as the MAD query: the synthetic
    volume is uniform, so a +20% level shift is planted from day-of-month
    20 onward (``shifted`` rides along) and the CUSUM must alarm only
    after the shift. Baseline μ₀/σ₀ come from the first 14 days (the
    reference-window practice), round at 1e-6 so Welford-vs-two-pass
    variance ulps cannot diverge the recursion cross-engine.

    The textbook recursion S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − μ₀ − kσ₀)) is not
    a window aggregate — but its closed form IS: S⁺ₜ = Cₜ − min(0,
    min_{{j≤t}} Cⱼ) over the plain cumulative sum Cₜ. Both cumulations run
    on the days frame (calendar-bounded, ~30 rows — the sweep-line
    precedent); the corpus-sized work is one partial+final daily count."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n0"))
        .select(
            "day",
            (
                F.col("n0")
                + F.when(
                    F.dayofmonth("day") >= _CUSUM_SHIFT_DOM,
                    F.floor(F.col("n0") / 5.0).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("n"),
            (F.dayofmonth("day") >= _CUSUM_SHIFT_DOM).alias("shifted"),
        )
    )
    w_day = Window.orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(w_day))
    ref = idx.where(F.col("i") <= _CUSUM_REF_DAYS).agg(
        F.round(F.avg("n"), _CUSUM_MIDR).alias("mu0"),
        F.round(
            F.greatest(F.stddev_samp("n"), F.lit(_CUSUM_EPS)), _CUSUM_MIDR
        ).alias("sigma0"),
    )
    w_cum = w_day.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = idx.crossJoin(F.broadcast(ref)).withColumn(
        "c",
        F.sum(
            F.col("n") - F.col("mu0") - _CUSUM_K * F.col("sigma0")
        ).over(w_cum),
    )
    s_pos = F.col("c") - F.least(F.min("c").over(w_cum), F.lit(0.0))
    return dev.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").alias("n_events"),
        "shifted",
        F.round(s_pos, ROUND_DIGITS).alias("cusum"),
        (s_pos > _CUSUM_H * F.col("sigma0")).alias("alarm"),
    ).orderBy("day")


_EWMA_A = 0.3  # smoothing factor


@query(
    "event_ewma_daily",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT date_trunc('day', ts) AS day, count(*)::DOUBLE AS n
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day, n, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    rec AS (
      SELECT i, day, n, n AS ewma FROM idx WHERE i = 1
      UNION ALL
      SELECT idx.i, idx.day, idx.n,
             round({_EWMA_A} * idx.n + {1 - _EWMA_A} * rec.ewma,
                   {_CUSUM_MIDR}) AS ewma
      FROM idx JOIN rec ON idx.i = rec.i + 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n::BIGINT AS n_events,
           round(ewma, {ROUND_DIGITS}) AS ewma,
           round(n / ewma - 1.0, {ROUND_DIGITS}) AS pct_dev
    FROM rec ORDER BY day
    """,
)
def event_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIALLY-WEIGHTED MOVING AVERAGE of the daily event volume
    (α=0.3, seeded at the first observation) with per-day deviation —
    the smoothed-baseline form dashboards and alerting rules quote
    ("today is +12% over trend").

    EWMA is a sequential recursion, not a window aggregate — on the
    corpus it would be a mis-shape, but the recursion runs on the DAILY
    frame (calendar-bounded, ~30 rows after the one corpus-sized
    reduce), so it folds as a JVM higher-order F.aggregate over the
    array-sorted day series: the accumulator grows the EWMA sequence,
    each step rounding at 1e-6 so both engines iterate identical
    doubles (the oracle is the same recursion as a recursive CTE).
    Nothing leaves the JVM; nothing collects to the driver."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    arr = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("s")
    )
    folded = F.aggregate(
        F.col("s"),
        F.lit(None).cast("array<double>"),
        lambda acc, x: F.when(acc.isNull(), F.array(x["n"])).otherwise(
            F.concat(
                acc,
                F.array(
                    F.round(
                        _EWMA_A * x["n"]
                        + (1 - _EWMA_A) * F.element_at(acc, -1),
                        _CUSUM_MIDR,
                    )
                ),
            )
        ),
    )
    return (
        arr.select("s", folded.alias("e"))
        .select(F.posexplode("s").alias("i", "t"), F.col("e"))
        .select(
            F.date_format(F.col("t.day"), "yyyy-MM-dd").alias("day"),
            F.col("t.n").cast("long").alias("n_events"),
            F.round(F.element_at("e", F.col("i") + 1), ROUND_DIGITS).alias(
                "ewma"
            ),
            F.round(
                F.col("t.n") / F.element_at("e", F.col("i") + 1) - 1.0,
                ROUND_DIGITS,
            ).alias("pct_dev"),
        )
        .orderBy("day")
    )


_TRI_TOPK = 15


@query(
    "event_path_trigrams",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS e1,
        lead(event_type, 1) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        lead(event_type, 2) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT e1, e2, e3, count(*)::BIGINT AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3
    LIMIT {_TRI_TOPK}
    """,
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral TRIGRAMS — the most frequent three-step event-type
    paths across user timelines (lead×2 within the per-user order) — the
    sequence-mining primitive behind funnel discovery and next-action
    models, and the event-stream twin of the text n-gram queries.

    One (user_id)-partitioned sort-window produces both leads in a
    single exchange; the trigram count is a partial+final aggregate on
    a ≤|event_types|³ key space, and the top-K is TakeOrderedAndProject
    (no global sort materialization) with a full deterministic
    tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(_TRI_TOPK)
    )


_STL_HALF = 3  # centered moving-average half-width (7-day window)


@query(
    "event_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts)::DATE AS day, count(*)::DOUBLE AS n
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT day, n,
        round(avg(n) OVER (ORDER BY day
                           ROWS BETWEEN {_STL_HALF} PRECEDING
                                    AND {_STL_HALF} FOLLOWING),
              {ROUND_DIGITS + 2}) AS trend
      FROM daily
    ),
    sea AS (
      SELECT dayofweek(day) AS dow,
             round(avg(n - trend), {ROUND_DIGITS + 2}) AS seasonal
      FROM tr GROUP BY 1
    )
    SELECT strftime(tr.day, '%Y-%m-%d') AS day, n::BIGINT AS n_events,
           round(trend, {ROUND_DIGITS}) AS trend,
           round(seasonal, {ROUND_DIGITS}) AS seasonal,
           round(n - trend - seasonal, {ROUND_DIGITS}) AS residual
    FROM tr JOIN sea ON sea.dow = dayofweek(tr.day)
    ORDER BY tr.day
    """,
)
def event_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ADDITIVE SEASONAL DECOMPOSITION of the daily volume
    (STL-lite): trend = centered 7-day moving average, seasonal =
    weekday mean of the detrended series, residual = remainder — the
    decomposition monitoring stacks run before alerting on "volume
    dropped" (is it a real drop, or just Sunday?). Completes the
    time-series suite: ACF detects the weekly cycle, the seasonality
    table quantifies it, CUSUM/MAD alarm on level shifts and spikes,
    and this separates all three components per day.

    Scale shape: one corpus-sized daily reduce; every window and join
    after it runs on the calendar-bounded day frame (~30 rows — the
    sweep-line precedent), with the 7-row weekday table joined back
    broadcast-style. Edge days keep their partial centered window
    (avg over the available frame) — identical semantics on both
    engines. Trend/seasonal round at 1e-6 before the subtraction so
    the residual's two chained float differences cannot drift the
    1e-4 hash."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    w_ma = Window.orderBy("day").rowsBetween(-_STL_HALF, _STL_HALF)
    tr = daily.withColumn(
        "trend", F.round(F.avg("n").over(w_ma), ROUND_DIGITS + 2)
    ).withColumn("dow", F.dayofweek("day") - 1)
    sea = tr.groupBy("dow").agg(
        F.round(
            F.avg(F.col("n") - F.col("trend")), ROUND_DIGITS + 2
        ).alias("seasonal")
    )
    return (
        tr.join(F.broadcast(sea), "dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n_events"),
            F.round("trend", ROUND_DIGITS).alias("trend"),
            F.round("seasonal", ROUND_DIGITS).alias("seasonal"),
            F.round(
                F.col("n") - F.col("trend") - F.col("seasonal"),
                ROUND_DIGITS,
            ).alias("residual"),
        )
        .orderBy("day")
    )


@query(
    "event_session_window_builtin",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value, event_id,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
                  >= INTERVAL '30 minutes'
             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '{_FMT_DUCK}') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '{_FMT_DUCK}')
             AS session_end_gap,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def event_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``F.session_window`` in a batch aggregation,
    cross-validated against an independent gaps-and-islands SQL
    derivation — so the builtin's exact merge semantics (a session is
    [start, last+gap); an event landing EXACTLY at the gap boundary
    starts a NEW session, hence the oracle's >= where
    event_sessionization uses >) are hash-pinned, not assumed. The same
    builtin drives the streaming twin (tests/test_streaming.py); this
    pins batch/stream/SQL to one semantic.

    Plan: session_window is a single partial+final SessionWindow
    aggregation — one shuffle on user_id, sessions assembled inside the
    aggregate, no window-function pass at all (compare
    event_sessionization's two-window + agg shape over the same
    exchange)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            F.date_format("w.end", _FMT).alias("session_end_gap"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


_MKV_MIDR = 8  # intermediate rounding (the pagerank _MID_R pattern)


@query(
    "event_markov_stationary",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS cur,
        lead(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    tm AS (
      SELECT cur, nxt, count(*)::DOUBLE AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    rowtot AS (SELECT cur, sum(n) AS tot FROM tm GROUP BY 1),
    p AS (
      SELECT tm.cur, tm.nxt, tm.n / rowtot.tot AS p
      FROM tm JOIN rowtot ON rowtot.cur = tm.cur
    ),
    k AS (SELECT count(*) AS k FROM rowtot),
    pi0 AS (SELECT cur AS state, 1.0 / k.k AS pi FROM rowtot, k),
    pi1 AS (
      SELECT p.nxt AS state, round(sum(pi0.pi * p.p), {_MKV_MIDR}) AS pi
      FROM p JOIN pi0 ON pi0.state = p.cur GROUP BY 1
    ),
    pi2 AS (
      SELECT p.nxt AS state, round(sum(pi1.pi * p.p), {_MKV_MIDR}) AS pi
      FROM p JOIN pi1 ON pi1.state = p.cur GROUP BY 1
    ),
    pi3 AS (
      SELECT p.nxt AS state, round(sum(pi2.pi * p.p), {_MKV_MIDR}) AS pi
      FROM p JOIN pi2 ON pi2.state = p.cur GROUP BY 1
    )
    SELECT state AS event_type, round(pi, {ROUND_DIGITS}) AS stationary_p
    FROM pi3 ORDER BY event_type
    """,
)
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIONARY DISTRIBUTION of the event-type Markov chain — three
    unrolled power-iteration steps πₜ₊₁ = πₜP from uniform, over the
    row-normalized transition matrix of event_transition_matrix. The
    long-run behavior summary ("where do user journeys spend time")
    that complements the one-step matrix; the same join+reaggregate
    shape as graph_copurchase_pagerank, but on a |event_types|² frame —
    after the ONE corpus-sized lead-window pass, every iteration is
    arithmetic over ≤25 rows. Intermediate 1e-8 rounding pins FP
    accumulation order cross-engine; three steps keep it
    oracle-checkable (the convergence loop is operators.graph.
    pagerank_until's job)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tm = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").cast("double").alias("n"))
        # Eager localCheckpoint, not persist(): the ≤25-row transition
        # count matrix is materialized ONCE (the single corpus
        # lead-window pass) and its lineage severed, so rowtot / p / the
        # 3 unrolled iterations are all ≤25-row arithmetic on top of it
        # — and no cached blocks leak for the rest of the session (the
        # previous persist() had no matching unpersist — round-4 ADVICE).
        .localCheckpoint(eager=True)
    )
    rowtot = tm.groupBy("cur").agg(F.sum("n").alias("tot"))
    p = tm.join(F.broadcast(rowtot), "cur").select(
        "cur", "nxt", (F.col("n") / F.col("tot")).alias("p")
    )
    k = rowtot.agg(F.count("*").alias("k"))
    pi = rowtot.crossJoin(F.broadcast(k)).select(
        F.col("cur").alias("state"), (1.0 / F.col("k")).alias("pi")
    )
    for _ in range(3):
        pi = (
            p.join(F.broadcast(pi), p.cur == pi.state)
            .groupBy(F.col("nxt").alias("_next"))
            .agg(F.round(F.sum(F.col("pi") * F.col("p")), _MKV_MIDR).alias("pi"))
            .select(F.col("_next").alias("state"), "pi")
        )
    return pi.select(
        F.col("state").alias("event_type"),
        F.round("pi", ROUND_DIGITS).alias("stationary_p"),
    ).orderBy("event_type")


_TT_MIDR = 6  # intermediate rounding for means/variances (FP pinning)
_TT_CRIT = 1.96  # two-sided 95%, normal approximation (dof >> 30 here)


@query(
    "event_welch_ttest_value",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
        CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 8)) AS BIGINT) % 2
          AS arm,
        sum(value) AS v
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm, count(*) AS n,
             round(avg(v), {_TT_MIDR}) AS m,
             round(var_samp(v), {_TT_MIDR}) AS s2
      FROM per_user GROUP BY arm
    ),
    w AS (
      SELECT a.n AS n0, a.m AS m0, a.s2 AS s20,
             b.n AS n1, b.m AS m1, b.s2 AS s21
      FROM arms a JOIN arms b ON a.arm = 0 AND b.arm = 1
    )
    SELECT n0::BIGINT AS n_a, n1::BIGINT AS n_b,
           round(m0, {ROUND_DIGITS}) AS mean_a,
           round(m1, {ROUND_DIGITS}) AS mean_b,
           round((m0 - m1) / sqrt(s20 / n0 + s21 / n1), {ROUND_DIGITS})
             AS t_stat,
           round(pow(s20 / n0 + s21 / n1, 2)
                 / (pow(s20 / n0, 2) / (n0 - 1)
                    + pow(s21 / n1, 2) / (n1 - 1)), 1) AS welch_dof,
           abs(round((m0 - m1) / sqrt(s20 / n0 + s21 / n1),
                     {ROUND_DIGITS})) > {_TT_CRIT} AS reject_95
    FROM w
    """,
)
def event_welch_ttest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE t-TEST on per-user total event value
    between the two deterministic md5 experiment arms — the
    continuous-metric companion to event_ab_test's proportion z-test
    (revenue-per-user is the metric most A/B decisions actually ride
    on), with the Welch–Satterthwaite effective dof reported and the
    normal-approximation 95% verdict (dof ≈ thousands here, where
    t and z are indistinguishable).

    One user-keyed reduce (the only corpus-sized shuffle), a 2-row
    conditional aggregate, then scalar arithmetic on a self-joined
    2-row frame. Means/variances round at 1e-6 before the t arithmetic
    so Welford-vs-two-pass variance ulps cannot flip the verdict
    cross-engine (the CUSUM baseline pattern)."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(2),
    )
    per_user = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .agg(F.sum("value").alias("v"))
        .withColumn("arm", arm)
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.round(F.avg("v"), _TT_MIDR).alias("m"),
        F.round(F.var_samp("v"), _TT_MIDR).alias("s2"),
    )
    a = arms.where(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("m").alias("m0"), F.col("s2").alias("s20")
    )
    b = arms.where(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("s2").alias("s21")
    )
    se2 = F.col("s20") / F.col("n0") + F.col("s21") / F.col("n1")
    t = F.round((F.col("m0") - F.col("m1")) / F.sqrt(se2), ROUND_DIGITS)
    dof = F.round(
        F.pow(se2, 2)
        / (
            F.pow(F.col("s20") / F.col("n0"), 2) / (F.col("n0") - 1)
            + F.pow(F.col("s21") / F.col("n1"), 2) / (F.col("n1") - 1)
        ),
        1,
    )
    return a.crossJoin(F.broadcast(b)).select(
        F.col("n0").alias("n_a"),
        F.col("n1").alias("n_b"),
        F.round("m0", ROUND_DIGITS).alias("mean_a"),
        F.round("m1", ROUND_DIGITS).alias("mean_b"),
        t.alias("t_stat"),
        dof.alias("welch_dof"),
        (F.abs(t) > _TT_CRIT).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-style sequential pattern matching. The missing member
# of the path family (funnel = fixed stage order, trigrams = local
# n-grams): a full REGEX over each user's event-type sequence, the
# row-pattern primitive SQL:2016 exposes as MATCH_RECOGNIZE and Spark
# does not ship — expressed here as encode → ordered collapse → regex.
# ---------------------------------------------------------------------------

_PAT_FUNNEL = "vc*p"  # view, any clicks, purchase (non-overlapping count)
_PAT_CLEAN = "v[^e]*p"  # a funnel with no error anywhere inside


@query(
    "event_pattern_regex_funnels",
    oracle=f"""
    WITH coded AS (
      SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS ch
      FROM events
    ),
    seqs AS (
      SELECT user_id,
             string_agg(ch, '' ORDER BY ts, event_id) AS seq
      FROM coded GROUP BY user_id
    ),
    scored AS (
      SELECT user_id,
             length(regexp_extract_all(seq, '{_PAT_FUNNEL}'))::BIGINT
               AS n_funnels,
             CASE WHEN regexp_matches(seq, '{_PAT_CLEAN}') THEN 1 ELSE 0 END
               AS clean
      FROM seqs
    )
    SELECT n_funnels,
           count(*)::BIGINT AS n_users,
           sum(clean)::BIGINT AS n_clean_users
    FROM scored
    GROUP BY n_funnels
    ORDER BY n_funnels
    """,
)
def event_pattern_regex_funnels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over per-user event sequences: encode each
    event type to one character, collapse each user's history into an
    ordered string, then COUNT non-overlapping ``{_PAT_FUNNEL}`` matches
    (view → clicks → purchase) and flag error-free funnels
    (``{_PAT_CLEAN}``) — arbitrary regular expressions over behavior
    sequences, strictly more expressive than the fixed-stage funnel.

    Scale shape: ONE shuffle (the per-user groupBy); the in-order
    collapse is array_sort over (ts, event_id, ch) structs inside the
    aggregate — no window pass, no second exchange — and the regex runs
    once per USER, not per event. Per-user strings are bounded by events
    per user; a whale user yields a long string, not a skewed shuffle
    (the heavy work is post-aggregation, spread by user hash). Both
    engines count non-overlapping leftmost matches, so the hash pins the
    regex semantics too."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("ch")
    )
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                lambda s: s["ch"],
            ),
        ).alias("seq")
    )
    scored = seqs.select(
        F.regexp_count("seq", F.lit(_PAT_FUNNEL)).alias("n_funnels"),
        F.when(F.col("seq").rlike(_PAT_CLEAN), 1).otherwise(0).alias("clean"),
    )
    return (
        scored.groupBy("n_funnels")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("clean").alias("n_clean_users"),
        )
        .orderBy("n_funnels")
    )

# Render the constants into the docstring (help()/docs otherwise show
# literal braces that silently drift from the values — ADVICE r6).
format_doc(event_pattern_regex_funnels, _PAT_FUNNEL=_PAT_FUNNEL, _PAT_CLEAN=_PAT_CLEAN)

