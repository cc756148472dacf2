"""Sketch-accuracy gates: the approximate queries (HLL distinct,
Greenwald-Khanna percentiles) are rows-only at the driver, so their
quality contract lives here — bounded relative error vs the exact
aggregate on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_imdb_classifier_spark import plans
from big_data_imdb_classifier_spark.sources.readers import load_table

from .conftest import SF_SMOKE

plans.load_all()


def test_hll_distinct_within_tolerance(spark):
    got = plans.QUERIES["approx_distinct_parts"](spark, SF_SMOKE).collect()
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.agg(F.countDistinct("l_partkey").alias("n")).collect()[0]["n"]
    for row in got:
        approx = row["approx_parts"]
        assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_approx_percentile_within_tolerance(spark):
    got = {
        r["l_returnflag"]: (r["ap50"], r["ap95"])
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
    for flag, (a50, a95) in got.items():
        e50, e95 = exact[flag]
        assert abs(a50 - e50) / e50 < 0.01, (flag, a50, e50)
        assert abs(a95 - e95) / e95 < 0.01, (flag, a95, e95)
