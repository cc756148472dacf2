"""Distributed exact order statistics.

``F.percentile`` (and DuckDB's quantile_cont) is an ObjectHashAggregate:
every value of a group is buffered and sorted inside one aggregation
buffer, so the final merge concentrates O(group size) memory and work on
a single reducer — fine for small groups, a guaranteed OOM for the
"3 distinct flags over a 100 TB fact table" shape where each group IS a
third of the corpus.

``group_quantiles`` computes the same exact interpolated quantiles with
NO value buffering anywhere:

1. groupBy (keys, value) → counts — the only full-data shuffle; partial
   aggregation absorbs duplicate values map-side.
2. range-repartition the distinct (keys, value) rows and run a
   TWO-LEVEL PREFIX SUM: a within-partition running count (window over
   the partition id) plus a per-(key, partition) offset frame — one row
   per key per shuffle partition, constant-size, never data-sized. Every
   distinct value now carries its exact per-key global rank interval
   [cum − c, cum).
3. the ≤ 2·|pcts| target ranks per key — built from the per-key totals,
   never collected — probe those intervals with a broadcast range join,
   and linear interpolation ``v_lo + frac·(v_hi − v_lo)`` reproduces
   quantile_cont / F.percentile bit-for-bit (frac = 0 degenerates to the
   exact order statistic on both engines).

Cost model at 100 TB: one shuffle of the distinct value domain + two
constant-size broadcast joins, vs. the builtin's one shuffle of ALL
values into |groups| buffers. The same machinery serves the global case
(keys=[]) — plans/queries_stats.py's equi-depth histogram edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_quantiles(
    df: DataFrame,
    keys: list[str],
    val_col: str,
    pcts: list[float],
) -> DataFrame:
    """Exact interpolated quantiles of ``val_col`` per ``keys`` group
    (global when ``keys`` is empty), computed distributively.

    Returns one row per group: ``keys`` + array column ``q`` holding the
    quantile values in ``pcts`` order. NULL values are excluded (same as
    F.percentile / quantile_cont).

    The rank-probe side is |groups| × 2·|pcts| rows — broadcastable up
    to millions of groups; beyond that, drop the broadcast hint and let
    the planner sort-merge on the equi-key part of the condition (the
    range part becomes the join filter).
    """
    if not pcts:
        raise ValueError("group_quantiles: pcts must be non-empty")
    spark = df.sparkSession
    dummy = not keys
    if dummy:
        df = df.withColumn("_gq_key", F.lit(0))
        keys = ["_gq_key"]
    kcols = [F.col(k) for k in keys]

    vc = (
        df.where(F.col(val_col).isNotNull())
        .groupBy(*kcols, F.col(val_col).alias("_v"))
        .agg(F.count("*").alias("_c"))
    )
    nparts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    vc = vc.repartitionByRange(nparts, *keys, "_v").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy(*keys, "_pid").orderBy("_v")
    vc = vc.withColumn("_local_cum", F.sum("_c").over(w_local))

    # One row per (key, shuffle partition): constant-size frame. The
    # prefix sum over it is per-key (partitionBy keys), so no global
    # single-partition window even with millions of groups.
    ptot = vc.groupBy(*keys, "_pid").agg(F.max("_local_cum").alias("_ptot"))
    w_ofs = (
        Window.partitionBy(*keys)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ofs = ptot.withColumn(
        "_ofs", F.coalesce(F.sum("_ptot").over(w_ofs), F.lit(0))
    )
    vc = (
        vc.join(F.broadcast(ofs.select(*keys, "_pid", "_ofs")),
                keys + ["_pid"])
        .withColumn("_cum", F.col("_local_cum") + F.col("_ofs"))
        .withColumn("_cum_prev", F.col("_cum") - F.col("_c"))
    )

    n_per_key = ofs.groupBy(*keys).agg(F.sum("_ptot").alias("_n"))
    idx = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pcts)], "_i INT, _p DOUBLE"
    )
    h = (F.col("_n") - 1) * F.col("_p")
    ranks = (
        n_per_key.crossJoin(F.broadcast(idx))
        .select(
            *keys,
            "_i",
            F.floor(h).alias("_klo"),
            F.ceil(h).alias("_khi"),
            (h - F.floor(h)).alias("_frac"),
        )
        .select(
            *keys,
            "_i",
            "_frac",
            F.explode(
                F.array(
                    F.struct(F.col("_klo").alias("_k"),
                             F.lit("lo").alias("_side")),
                    F.struct(F.col("_khi").alias("_k"),
                             F.lit("hi").alias("_side")),
                )
            ).alias("_s"),
        )
        .select(*keys, "_i", "_frac",
                F.col("_s._k").alias("_k"), F.col("_s._side").alias("_side"))
    )
    cond = _and_all(
        [vc[k] == ranks[k] for k in keys]
        + [ranks["_k"] >= vc["_cum_prev"], ranks["_k"] < vc["_cum"]]
    )
    hit = vc.join(F.broadcast(ranks), cond).select(
        *[vc[k] for k in keys], "_v", "_i", "_frac", "_side"
    )
    per_pct = hit.groupBy(*keys, "_i", "_frac").agg(
        F.max(F.when(F.col("_side") == "lo", F.col("_v"))).alias("_vlo"),
        F.max(F.when(F.col("_side") == "hi", F.col("_v"))).alias("_vhi"),
    )
    out = (
        per_pct.select(
            *keys,
            "_i",
            (
                F.col("_vlo")
                + F.col("_frac") * (F.col("_vhi") - F.col("_vlo"))
            ).alias("_edge"),
        )
        .groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_edge"))),
                lambda t: t._edge,
            ).alias("q")
        )
    )
    if dummy:
        out = out.drop("_gq_key")
    return out


def _and_all(conds):
    c = conds[0]
    for x in conds[1:]:
        c = c & x
    return c
