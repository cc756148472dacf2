"""Property-based differential tests for the Spark-missing join
operators (as-of join, banded range join): random small inputs vs an
exhaustive brute-force reference, so the union+window rewrite and the
bucket-probe rewrite are pinned to the declarative semantics rather than
a handful of fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_imdb_classifier_spark.operators.relational import (
    asof_join,
    range_join_count,
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # key
        st.integers(min_value=0, max_value=40),   # ts (epoch sec)
        st.integers(min_value=0, max_value=99),   # payload
    ),
    min_size=0,
    max_size=12,
)


def _frame(spark, rows, payload_name):
    df = spark.createDataFrame(
        [(k, t, v) for k, t, v in rows] or [(None, None, None)],
        "k long, t long, {} long".format(payload_name),
    )
    if not rows:
        df = df.where(F.lit(False))
    return df.withColumn("ts", F.timestamp_seconds("t"))


@given(left=rows_strategy, right=rows_strategy)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = _frame(spark, left, "lv")
    rdf = _frame(spark, right, "rv")
    for strict in (True, False):
        got = {
            (r.k, r.t, r.lv): r.rv_asof
            for r in asof_join(
                ldf, rdf, keys=["k"], ts_col="ts", carry=["rv"], strict=strict
            ).collect()
        }
        assert len(got) == len(set(left))
        for k, t, v in set(left):
            cands = [
                (rt, rv)
                for rk, rt, rv in right
                if rk == k and (rt < t if strict else rt <= t)
            ]
            want = max(cands)[1] if cands else None
            assert got[(k, t, v)] == want, (k, t, strict, cands)


@given(left=rows_strategy, right=rows_strategy,
       lookback=st.sampled_from([1, 3, 10]))
@settings(max_examples=12, deadline=None)
def test_range_join_count_matches_bruteforce(spark, left, right, lookback):
    # dedupe left rows: range_join_count groups by the full left row, so
    # duplicate left rows collapse — mirror that in the reference.
    left = sorted(set(left))
    ldf = _frame(spark, left, "lv")
    rdf = _frame(spark, right, "rv")
    out = range_join_count(
        ldf, rdf, keys=["k"], left_ts="ts", right_ts="ts",
        lookback_sec=lookback,
    ).collect()
    got = {(r.k, r.t, r.lv): r.n_in_range for r in out}
    assert len(got) == len(left)
    for k, t, v in left:
        want = sum(
            1 for rk, rt, _ in right if rk == k and t - lookback < rt < t
        )
        assert got[(k, t, v)] == want, (k, t, lookback)


@given(left=rows_strategy, right=rows_strategy,
       tolerance=st.sampled_from([None, 2, 5]))
@settings(max_examples=12, deadline=None)
def test_asof_join_forward_and_tolerance_match_bruteforce(
    spark, left, right, tolerance
):
    """merge_asof parity: forward direction and tolerance, both strict
    and non-strict, against an exhaustive per-row reference. Tie rule:
    among equal right timestamps the largest payload wins (the
    operator's documented deterministic total order)."""
    ldf = _frame(spark, left, "lv")
    rdf = _frame(spark, right, "rv")
    for direction in ("backward", "forward"):
        for strict in (True, False):
            got = {
                (r.k, r.t, r.lv): r.rv_asof
                for r in asof_join(
                    ldf, rdf, keys=["k"], ts_col="ts", carry=["rv"],
                    strict=strict, direction=direction,
                    tolerance_sec=tolerance,
                ).collect()
            }
            assert len(got) == len(set(left))
            for k, t, v in set(left):
                if direction == "backward":
                    cands = [
                        (rt, rv) for rk, rt, rv in right
                        if rk == k and (rt < t if strict else rt <= t)
                    ]
                    best = max(cands) if cands else None
                    in_tol = best and (
                        tolerance is None or t - best[0] <= tolerance
                    )
                else:
                    cands = [
                        (rt, rv) for rk, rt, rv in right
                        if rk == k and (rt > t if strict else rt >= t)
                    ]
                    # nearest-forward ts; among ties largest payload
                    best = (
                        max(
                            (c for c in cands if c[0] == min(x[0] for x in cands)),
                        )
                        if cands
                        else None
                    )
                    in_tol = best and (
                        tolerance is None or best[0] - t <= tolerance
                    )
                want = best[1] if (best and in_tol) else None
                assert got[(k, t, v)] == want, (
                    k, t, direction, strict, tolerance, cands,
                )


interval_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200_000),  # start offset sec
        st.integers(min_value=0, max_value=90_000),   # duration sec
    ),
    min_size=1,
    max_size=14,
)


@given(iv=interval_strategy)
@settings(max_examples=10, deadline=None)
def test_interval_concurrency_matches_bruteforce(spark, iv):
    """Sweep-line peak concurrency (distributed two-level prefix sum) vs
    the O(n²) definition: for each endpoint ts, count intervals with
    start ≤ ts ≤ end; per-day peak over that day's endpoints."""
    from collections import defaultdict
    from datetime import datetime, timedelta, timezone

    from big_data_imdb_classifier_spark.operators.relational import (
        interval_concurrency_profile,
    )

    base = datetime(2024, 3, 1, tzinfo=timezone.utc)
    spans = [(base + timedelta(seconds=s), base + timedelta(seconds=s + d))
             for s, d in iv]
    df = spark.createDataFrame(
        [(a.replace(tzinfo=None), b.replace(tzinfo=None)) for a, b in spans],
        "s_start timestamp, s_end timestamp",
    )
    got = {
        (r["day"].date().isoformat(), r["peak_concurrency"],
         r["intervals_started"])
        for r in interval_concurrency_profile(df).collect()
    }

    peaks: dict = defaultdict(int)
    starts: dict = defaultdict(int)
    endpoints = {t for a, b in spans for t in (a, b)}
    for ts in endpoints:
        conc = sum(1 for a, b in spans if a <= ts <= b)
        day = ts.date().isoformat()
        peaks[day] = max(peaks[day], conc)
    for a, _ in spans:
        starts[a.date().isoformat()] += 1
    want = {(d, peaks[d], starts.get(d, 0)) for d in peaks}
    assert got == want
