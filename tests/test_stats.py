"""Sketch-accuracy gates: the approximate queries (HLL distinct,
Greenwald-Khanna percentiles) are rows-only at the driver, so their
quality contract lives here — bounded relative error vs the exact
aggregate on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_imdb_classifier_spark import plans
from big_data_imdb_classifier_spark.sources.readers import load_table

from .conftest import SF_SMOKE

plans.load_all()


def test_hll_distinct_within_tolerance(spark):
    """The query carries its own in-query tolerance assertion (approx_ok,
    oracle-pinned TRUE); this test re-checks the exact count and the flag
    independently."""
    (row,) = plans.QUERIES["approx_distinct_parts"](spark, SF_SMOKE).collect()
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.agg(F.countDistinct("l_partkey").alias("n")).collect()[0]["n"]
    assert row["exact_parts"] == exact
    assert row["approx_ok"] is True


def test_approx_percentile_within_tolerance(spark):
    """The query now asserts sketch-vs-exact tolerance in-query (ap*_ok
    booleans, oracle-pinned TRUE); re-check the flags and the exact
    values independently here."""
    got = {
        r["l_returnflag"]: r
        for r in plans.QUERIES["approx_percentile_price"](spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, row in got.items():
        e50, e95 = exact[flag]
        assert row["ap50_ok"] is True and row["ap95_ok"] is True, (flag,)
        assert abs(row["p50_exact"] - round(e50, 4)) < 1e-9
        assert abs(row["p95_exact"] - round(e95, 4)) < 1e-9


def test_hll_sketch_survives_parquet_roundtrip(spark, tmp_path):
    """The two-job sketch-rollup pattern: job 1 writes per-day HLL
    sketches to parquet (binary column); job 2 reads them back and
    answers the all-days distinct count by sketch union — byte-identical
    to unioning the in-memory sketches, within 5% of the exact count."""
    from pyspark.sql import functions as F

    from big_data_imdb_classifier_spark.sources.readers import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    path = str(tmp_path / "daily_sketches")
    daily.write.parquet(path)
    reread = spark.read.parquet(path)
    est = reread.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    exact = ev.agg(F.count_distinct("user_id").alias("n")).collect()[0]["n"]
    direct = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    assert est == direct                      # parquet round-trip is lossless
    assert abs(est - exact) / exact <= 0.05   # documented HLL accuracy


def test_group_quantiles_matches_builtin_percentile(spark):
    """Distributed exact order statistics == the builtin buffering
    aggregate, bit-for-bit, on adversarial data: duplicates, ties across
    range-partition boundaries, NULLs, single-row groups."""
    import random

    from big_data_imdb_classifier_spark.operators.stats import group_quantiles

    rng = random.Random(7)
    rows = []
    for i in range(5000):
        g = ["a", "b", "c"][i % 3]
        # heavy duplication + a null sprinkle
        v = None if i % 97 == 0 else float(rng.choice([1, 2, 2, 3, 5, 8, 13, 21]))
        rows.append((g, v))
    rows.append(("solo", 42.0))  # single-row group: all quantiles = 42
    df = spark.createDataFrame(rows, "g string, v double")
    pcts = [0.1, 0.25, 0.5, 0.9, 0.99]

    got = {
        r["g"]: r["q"]
        for r in group_quantiles(df, ["g"], "v", pcts).collect()
    }
    want = {
        r["g"]: r["p"]
        for r in df.groupBy("g")
        .agg(F.percentile("v", F.array(*[F.lit(p) for p in pcts])).alias("p"))
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g] == want[g], (g, got[g], want[g])
    assert got["solo"] == [42.0] * len(pcts)

    # global (keys=[]) path
    got_g = group_quantiles(df, [], "v", pcts).collect()[0]["q"]
    want_g = df.agg(
        F.percentile("v", F.array(*[F.lit(p) for p in pcts])).alias("p")
    ).collect()[0]["p"]
    assert got_g == want_g


def test_group_quantiles_weighted_equals_expanded(spark):
    """The weight_col pre-aggregated entry point must equal quantiles
    over the row-expanded multiset — rank intervals are cumulative
    weights, so a (value, count) domain frame stands in for the fact
    table exactly (the one-scan stats_mad_outliers plan rides on
    this)."""
    import random

    from big_data_imdb_classifier_spark.operators.stats import group_quantiles

    rng = random.Random(11)
    agg_rows, expanded = [], []
    for g in ["a", "b"]:
        for v in sorted({round(rng.uniform(-5, 5), 2) for _ in range(40)}):
            c = rng.randint(1, 7)
            agg_rows.append((g, v, c))
            expanded.extend((g, v) for _ in range(c))
    wdf = spark.createDataFrame(agg_rows, "g string, v double, n long")
    xdf = spark.createDataFrame(expanded, "g string, v double")
    pcts = [0.05, 0.5, 0.75, 0.95]
    got = {
        r["g"]: r["q"]
        for r in group_quantiles(wdf, ["g"], "v", pcts, weight_col="n").collect()
    }
    want = {
        r["g"]: r["q"]
        for r in group_quantiles(xdf, ["g"], "v", pcts).collect()
    }
    assert got == want


def test_group_quantiles_enum_path_equals_general(spark):
    """The bounded-key fast path (enum_keys=True) must reproduce the
    general path bit-for-bit on adversarial data — duplicates, ties
    across range-partition boundaries, NULLs, single-row groups — for
    plain, weighted, assume_distinct, and global (keys=[]) invocations,
    and its returned domain must be the complete weighted multiset
    INCLUDING null values (stats_mad_outliers' denominator rides on
    that)."""
    import random

    from big_data_imdb_classifier_spark.operators.stats import group_quantiles

    rng = random.Random(23)
    rows = []
    for i in range(5000):
        g = ["a", "b", "c"][i % 3]
        v = None if i % 97 == 0 else float(rng.choice([1, 2, 2, 3, 5, 8, 13, 21]))
        rows.append((g, v))
    rows.append(("solo", 42.0))
    df = spark.createDataFrame(rows, "g string, v double")
    pcts = [0.1, 0.25, 0.5, 0.9, 0.99]

    gen = {r["g"]: r["q"] for r in group_quantiles(df, ["g"], "v", pcts).collect()}
    fast, domain = group_quantiles(
        df, ["g"], "v", pcts, enum_keys=True, return_domain=True
    )
    fast = {r["g"]: r["q"] for r in fast.collect()}
    assert gen == fast

    # Domain completeness: per-group weights sum to ALL rows (nulls in).
    dom = {r["g"]: r["t"] for r in domain.groupBy("g").agg(
        F.sum("_c").alias("t")).collect()}
    exp = {r["g"]: r["t"] for r in df.groupBy("g").agg(
        F.count("*").alias("t")).collect()}
    assert dom == exp
    null_weight = domain.where(F.col("_v").isNull()).agg(
        F.sum("_c")).collect()[0][0]
    assert null_weight == sum(1 for _, v in rows if v is None)

    # Weighted + assume_distinct parity.
    wdf = df.groupBy("g", "v").agg(F.count("*").alias("n"))
    gw = {r["g"]: r["q"] for r in group_quantiles(
        wdf, ["g"], "v", pcts, weight_col="n", assume_distinct=True).collect()}
    fw = {r["g"]: r["q"] for r in group_quantiles(
        wdf, ["g"], "v", pcts, weight_col="n", assume_distinct=True,
        enum_keys=True).collect()}
    assert gw == fw

    # Global (dummy-key) enum path is FORBIDDEN: it agreed with the
    # general path on toy domains like this one but scrambled ranks at
    # sf0.1-sized domains (round 9, histogram_equidepth_price edges) —
    # the guard turns that silent wrong-answer mode into a loud error.
    import pytest as _pytest_g

    with _pytest_g.raises(ValueError, match="real key column"):
        group_quantiles(df, [], "v", pcts, enum_keys=True)

    # The cap guards against misuse on unbounded keys.
    wide = spark.createDataFrame(
        [(str(i), float(i)) for i in range(40)], "g string, v double"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bounded-enum cap"):
        group_quantiles(wide, ["g"], "v", [0.5], enum_keys=True).collect()


def test_group_quantiles_enum_dedup_rides_range_exchange(spark):
    """Plan shape: on the enum path the dedup aggregation must add NO
    exchange beyond the single range exchange — RangePartitioning on
    (keys, value) satisfies the aggregate's clustering requirement. If
    a Spark upgrade ever breaks that, partition ids would still be
    range-consistent (computed downstream), but the pass would silently
    pay a second shuffle — this test turns that into a loud failure."""
    df = spark.range(10000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 17).cast("double").alias("v"),
    )
    d = df.repartitionByRange(8, "g", "v").groupBy("g", "v").agg(
        F.sum(F.lit(1)).alias("_c")
    )
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_group_quantiles_property_vs_builtin(spark):
    """Hypothesis differential: random grouped value multisets (heavy
    duplication, negatives, tiny groups) — group_quantiles must equal
    the builtin buffering aggregate. Equality is to 1 ulp: the operator
    interpolates as ``lo + frac·(hi−lo)`` (DuckDB quantile_cont's form —
    the oracle the driver hashes against), while Spark's builtin uses
    ``(1−frac)·lo + frac·hi``; the two differ by at most one rounding
    step, far under the engine's 1e-4 result rounding."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_imdb_classifier_spark.operators.stats import group_quantiles

    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),          # group
            st.integers(min_value=-5, max_value=5),         # value (dup-heavy)
        ),
        min_size=1,
        max_size=30,
    )
    pcts_strategy = st.lists(
        st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.77, 0.9, 1.0]),
        min_size=1, max_size=4, unique=True,
    )

    @given(rows=rows_strategy, pcts=pcts_strategy)
    @settings(max_examples=12, deadline=None)
    def check(rows, pcts):
        df = spark.createDataFrame(
            [(f"g{g}", float(v)) for g, v in rows], "g string, v double"
        )
        got = {
            r["g"]: r["q"]
            for r in group_quantiles(df, ["g"], "v", pcts).collect()
        }
        want = {
            r["g"]: r["p"]
            for r in df.groupBy("g")
            .agg(
                F.percentile(
                    "v", F.array(*[F.lit(p) for p in pcts])
                ).alias("p")
            )
            .collect()
        }
        assert set(got) == set(want)
        for g in want:
            for a, b in zip(got[g], want[g]):
                assert a == pytest.approx(b, rel=1e-12, abs=1e-12), (
                    g, got[g], want[g]
                )

    check()


def test_autocorrelation_is_bounded_and_pairs_shrink(spark):
    """ACF sanity at the smoke SF: every coefficient is a valid Pearson
    value in [-1, 1], lags are exactly 1..7, and the aligned-pair count
    is non-increasing in the lag (each extra day of shift can only
    drop pairs off the end of the calendar)."""
    from big_data_imdb_classifier_spark.plans import queries_events as QE

    rows = QE.event_ts_autocorrelation(spark, SF_SMOKE).collect()
    assert [r["lag"] for r in rows] == list(range(1, 8))
    assert all(-1.0 <= r["acf"] <= 1.0 for r in rows if r["acf"] is not None)
    pairs = [r["n_pairs"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)


def test_distributed_cumsum_matches_window(spark):
    """distributed_cumsum == a plain single-partition window cumsum, on
    signed multi-measure data (the partition totals must come from the
    raw measure, not the running max) — global and keyed forms."""
    from pyspark.sql.window import Window

    from big_data_imdb_classifier_spark.operators.stats import (
        distributed_cumsum,
    )

    rows = [
        (k, i, (i * 7 + ord(k)) % 13 - 6, float((i * 3 - ord(k)) % 11 - 5))
        for k in ("a", "b")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k STRING, o INT, m1 INT, m2 DOUBLE")

    # Keyed form.
    got = {
        (r["k"], r["o"]): (r["m1_cum"], r["m2_cum"])
        for r in distributed_cumsum(df, ["k"], "o", ["m1", "m2"]).collect()
    }
    w = Window.partitionBy("k").orderBy("o").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r["k"], r["o"]): (r["c1"], r["c2"])
        for r in df.select(
            "k",
            "o",
            F.sum("m1").over(w).alias("c1"),
            F.sum("m2").over(w).alias("c2"),
        ).collect()
    }
    assert got == want

    # Global form (keys=[]): dummy key added and dropped.
    gdf = df.where(F.col("k") == "a").select("o", "m1")
    gout = distributed_cumsum(gdf, [], "o", ["m1"])
    assert set(gout.columns) == {"o", "m1", "m1_cum"}
    got_g = {r["o"]: r["m1_cum"] for r in gout.collect()}
    acc, want_g = 0, {}
    for i in range(200):
        acc += (i * 7 + ord("a")) % 13 - 6
        want_g[i] = acc
    assert got_g == want_g


def test_rank_value_lookup_matches_linear_scan(spark):
    """rank_value_lookup == 'largest marker pos <= probe pos' by brute
    force, including probes before any in-partition marker (offset-frame
    carry), equal-position ties (marker wins), and sparse markers."""
    from big_data_imdb_classifier_spark.operators.stats import (
        rank_value_lookup,
    )

    marker_rows = [(p, float(p * 10)) for p in [0, 3, 4, 9, 17, 40, 41, 99]]
    probe_rows = [(i, (i * 13) % 120) for i in range(80)]
    markers = spark.createDataFrame(marker_rows, "pos LONG, v DOUBLE")
    probes = spark.createDataFrame(probe_rows, "pid LONG, pos LONG")

    got = {
        r["pid"]: r["v_at"]
        for r in rank_value_lookup(markers, probes).collect()
    }
    want = {}
    for pid, pos in probe_rows:
        best = [mv for mp, mv in marker_rows if mp <= pos]
        want[pid] = best[-1] if best else None
    assert got == want
