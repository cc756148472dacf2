"""Relational query suite (SURVEY.md §2.2-2.7) over the TPC-H-ish testdata.

Each query composes operators from ``operators.relational`` and registers a
DuckDB oracle. Scale notes are inline: broadcasts marked where a side is a
bounded dimension (nation/region/supplier — small at ANY scale factor);
fact-to-fact joins are left to AQE (sort-merge with runtime skew split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import (
    anti_join,
    count_enrich,
    impute_mean,
    semi_join,
    top_k_per_group,
)
from ..sources.readers import load_table
from .registry import ROUND_DIGITS as R
from .registry import format_doc, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: scan → join → agg → window top-1 → sort.  This is the
# reference's J1+A1+W1+O1 shape (count-per-entity → top-1-per-group →
# ordered sink, reference data_utils.py:300-344,434) transplanted onto the
# testdata star schema.
# ---------------------------------------------------------------------------

@query(
    "flagship_top_customer_per_nation",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name AS nation, c.c_custkey AS custkey, c.c_name AS cust_name,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY nation ORDER BY revenue DESC, custkey) AS rn
      FROM rev
    )
    SELECT nation, custkey, cust_name, revenue
    FROM ranked WHERE rn = 1 ORDER BY nation
    """,
)
def flagship_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue customer per nation.

    Plan shape at scale: lineitem⋈orders and ⋈customer are fact joins
    (shuffle/SMJ, AQE-managed); nation is a 25-row dimension → broadcast.
    The aggregate is partial+final hash agg; the window re-uses the
    nation hash partitioning.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R
            ).alias("revenue")
        )
    )
    top = top_k_per_group(
        rev,
        ["nation"],
        [F.col("revenue").desc(), F.col("custkey")],
        k=1,
    )
    return top.orderBy("nation")


# ---------------------------------------------------------------------------
# Aggregations (A1-A6) — TPC-H Q1 style pricing summary.
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), {R})                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), {R})                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), {R})           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), {R}) AS sum_charge,
           ROUND(AVG(l_quantity), {R})                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), {R})                              AS avg_price,
           ROUND(AVG(l_discount), {R})                                   AS avg_disc,
           COUNT(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped multi-aggregate: ONE scan, ONE shuffle, 8 aggs.

    Contrast with the reference's per-column aggregate jobs
    (data_utils.py:244-264 called 5×, SURVEY §4.3.4): all statistics come
    from a single partial+final hash aggregation.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), R).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), R).alias("sum_base_price"),
            F.round(F.sum(disc_price), R).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), R).alias("sum_charge"),
            F.round(F.avg("l_quantity"), R).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), R).alias("avg_price"),
            F.round(F.avg("l_discount"), R).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "group_count_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def group_count_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain group-by count (A1, reference data_utils.py:317)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "global_multi_agg",
    oracle=f"""
    SELECT COUNT(*)                        AS n_rows,
           COUNT(DISTINCT o_custkey)       AS n_customers,
           ROUND(AVG(o_totalprice), {R})   AS avg_price,
           ROUND(MIN(o_totalprice), {R})   AS min_price,
           ROUND(MAX(o_totalprice), {R})   AS max_price,
           ROUND(STDDEV_SAMP(o_totalprice), 2) AS std_price
    FROM orders
    """,
)
def global_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All global statistics in ONE job (A2/A3 — replaces the reference's
    one-collect-per-column pattern, data_utils.py:244-264)."""
    return _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), R).alias("avg_price"),
        F.round(F.min("o_totalprice"), R).alias("min_price"),
        F.round(F.max("o_totalprice"), R).alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("std_price"),
    )


@query(
    "rollup_qty",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), {R}) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — free Catalyst capability the reference
    lacks (SURVEY §2.4 note)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), R).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "cube_count",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def cube_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims (SURVEY §2.4 extension)."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "pivot_status_qty",
    oracle=f"""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), {R}) AS O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), {R}) AS F
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no extra distinct-scan job)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), R))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Projections / filters / scalar expressions (P1-P8, F3-F6).
# ---------------------------------------------------------------------------

@query(
    "filter_project_cast",
    oracle=f"""
    SELECT p_partkey AS partkey, p_name AS part_name, p_brand,
           CAST(p_size AS BIGINT) AS size_l,
           ROUND(p_retailprice * 1.1, {R}) AS marked_up
    FROM part WHERE p_size > 25 ORDER BY partkey
    """,
)
def filter_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select/rename/cast/filter (P1/P2/P4/P7) — filter and pruning push
    into the parquet scan (verified in tests via the physical plan)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") > 25)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("p_brand"),
            F.col("p_size").cast("long").alias("size_l"),
            F.round(F.col("p_retailprice") * 1.1, R).alias("marked_up"),
        )
        .orderBy("partkey")
    )


@query(
    "case_when_buckets",
    oracle=f"""
    SELECT CASE WHEN o_totalprice >= 150000 THEN 'big'
                WHEN o_totalprice >= 50000  THEN 'mid'
                ELSE 'small' END AS bucket,
           COUNT(*) AS n, ROUND(AVG(o_totalprice), {R}) AS avg_price
    FROM orders GROUP BY 1 ORDER BY bucket
    """,
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN conditional projection (P6 family)."""
    bucket = (
        F.when(F.col("o_totalprice") >= 150000, "big")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("small")
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), R).alias("avg_price"),
        )
        .orderBy("bucket")
    )


@query(
    "sentinel_repair",
    oracle="""
    SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'UNK') AS flag, COUNT(*) AS n
    FROM lineitem GROUP BY 1 ORDER BY flag
    """,
)
def sentinel_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel→NULL→default repair (F4/P6, the reference's '\\N' contract,
    data_utils.py:239) expressed as nullif+coalesce."""
    flag = F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("UNK"))
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(flag.alias("flag"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("flag")
    )


@query(
    "decade_bucket",
    oracle="""
    SELECT CONCAT(CAST(CAST(FLOOR(EXTRACT(year FROM o_orderdate) / 10) * 10 AS INT) AS VARCHAR), 's') AS decade,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1 ORDER BY decade
    """,
)
def decade_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decade bucketing (F3, reference classifier_pipeline.py:373) applied
    to the orders date: floor(year/10)*10 || 's'."""
    decade = F.concat(
        (F.floor(F.year("o_orderdate") / 10) * 10).cast("int").cast("string"),
        F.lit("s"),
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(decade.alias("decade"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("decade")
    )


@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey AS partkey,
           LOWER(p_name)  AS name_lower,
           UPPER(p_brand) AS brand_upper,
           TRIM(CONCAT(p_name, ' ', p_brand)) AS name_brand,
           SUBSTRING(p_name, 1, 5) AS name_head,
           LENGTH(p_name) AS name_len,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel
    FROM part WHERE p_partkey < 50 ORDER BY partkey
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface (F1 subset that is native: lower/upper/trim/
    concat/substring/length/regexp_replace)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 50)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.trim(F.concat(F.col("p_name"), F.lit(" "), F.col("p_brand"))).alias(
                "name_brand"
            ),
            F.substring("p_name", 1, 5).alias("name_head"),
            F.length("p_name").alias("name_len"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        )
        .orderBy("partkey")
    )


@query(
    "impute_mean_value",
    oracle=f"""
    WITH m AS (SELECT AVG(value) AS mv FROM events)
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CASE WHEN event_type = 'error' THEN (SELECT mv FROM m)
                          ELSE value END), {R}) AS avg_filled
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def impute_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-statistic imputation (P6+A2): global mean computed in ONE agg
    job, folded into the plan as a literal — the reference's mean_dict
    contract (classifier_pipeline.py:115-121,190-199) without driver state
    mutation."""
    ev = _t(spark, sf_dir, "events")
    mean_value = ev.agg(F.avg("value")).first()[0]
    filled = F.when(F.col("event_type") == "error", F.lit(mean_value)).otherwise(
        F.col("value")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(filled), R).alias("avg_filled"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Joins (J1-J5).
# ---------------------------------------------------------------------------

@query(
    "left_join_enrich",
    oracle="""
    SELECT o.o_orderkey AS orderkey, o.o_orderstatus, c.c_name AS cust_name,
           c.c_mktsegment AS segment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY orderkey
    """,
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join with cross-named keys (J1,
    reference classifier_pipeline.py:267-268)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderstatus"),
            F.col("c_name").alias("cust_name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .orderBy("orderkey")
    )


@query(
    "semi_join_big_spenders",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS cust_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    ORDER BY custkey
    """,
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (J5/P5) — replaces the reference's driver-set
    ``isin`` filter (data_utils.py:396) with a distributed semi join."""
    customer = _t(spark, sf_dir, "customer")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        semi_join(customer, big, "c_custkey")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("cust_name"))
        .orderBy("custkey")
    )


@query(
    "anti_join_no_urgent",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS segment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY custkey
    """,
)
def anti_join_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (J5/U2) — replaces driver set-difference
    (data_utils.py:392)."""
    customer = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        anti_join(customer, urgent, "c_custkey")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment"))
        .orderBy("custkey")
    )


@query(
    "count_enrich_window",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_suppkey AS suppkey,
           COUNT(*) OVER (PARTITION BY l_suppkey) AS supp_line_count
    FROM lineitem WHERE l_suppkey < 5
    ORDER BY orderkey, linenumber
    """,
)
def count_enrich_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-enrichment via ONE window shuffle instead of the reference's
    groupBy+join-back double shuffle (J4, data_utils.py:316-324)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 5)
    return (
        count_enrich(li, "l_suppkey", "supp_line_count")
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("supp_line_count"),
        )
        .orderBy("orderkey", "linenumber")
    )


# ---------------------------------------------------------------------------
# Windows beyond top-1 (W1 + extended frame surface).
# ---------------------------------------------------------------------------

@query(
    "topk_suppliers_per_nation",
    oracle="""
    SELECT * FROM (
      SELECT s_nationkey AS nationkey, s_suppkey AS suppkey,
             ROUND(s_acctbal, 4) AS acctbal,
             ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal DESC, s_suppkey) AS rn
      FROM supplier
    ) WHERE rn <= 3 ORDER BY nationkey, rn
    """,
)
def topk_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group with explicit deterministic tiebreak (W1 with the
    §7.5 tie fix)."""
    sup = _t(spark, sf_dir, "supplier")
    out = top_k_per_group(
        sup,
        ["s_nationkey"],
        [F.col("s_acctbal").desc(), F.col("s_suppkey")],
        k=3,
        keep_rank=True,
    )
    return out.select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_suppkey").alias("suppkey"),
        F.round("s_acctbal", 4).alias("acctbal"),
        F.col("rn"),
    ).orderBy("nationkey", "rn")


@query(
    "window_analytics",
    oracle=f"""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           ROUND(o_totalprice, {R}) AS price,
           ROUND(LAG(o_totalprice) OVER w, {R})  AS prev_price,
           ROUND(LEAD(o_totalprice) OVER w, {R}) AS next_price,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), {R}) AS running_total,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
    FROM orders WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY custkey, orderkey
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/rank + explicit rowsBetween running frame — the full
    analytic-window surface the reference never exercises (SURVEY §2.5
    note)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rankw = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 20)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", R).alias("price"),
            F.round(F.lag("o_totalprice").over(w), R).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), R).alias("next_price"),
            F.round(F.sum("o_totalprice").over(run), R).alias("running_total"),
            F.rank().over(rankw).alias("price_rank"),
        )
        .orderBy("custkey", "orderkey")
    )


# ---------------------------------------------------------------------------
# Sorts / limits (O1-O3) and set operations (U1-U2).
# ---------------------------------------------------------------------------

@query(
    "sort_limit_topn",
    oracle=f"""
    SELECT o_orderkey AS orderkey, ROUND(o_totalprice, {R}) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + LIMIT with a unique tiebreak (O1/O3) — Spark executes
    this as TakeOrderedAndProject (no full sort materialization)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", R).alias("price"),
        )
    )


@query(
    "union_distinct_nationkeys",
    oracle="""
    SELECT DISTINCT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) ORDER BY nationkey
    """,
)
def union_distinct_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + DISTINCT (U1)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct().orderBy("nationkey")


@query(
    "intersect_nationkeys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def intersect_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (U2) — distributed replacement for driver-side set &."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "except_nationkeys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def except_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (U2) — distributed replacement for driver-side set -.
    ``subtract`` is EXCEPT DISTINCT (set semantics), matching SQL EXCEPT;
    ``exceptAll`` would be bag difference."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


@query(
    "distinct_status_priority",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders ORDER BY o_orderstatus, o_orderpriority
    """,
)
def distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# Rows-only (approximate — value can't hash-match an exact oracle).
@query(
    "approx_distinct_parts",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_ok
    FROM lineitem
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct (SURVEY §2.4 extension), oracle-
    pinned: the HLL estimate itself is non-deterministic across engines,
    so the query emits the EXACT distinct count (hash-matched by DuckDB)
    plus ``approx_ok`` — the in-query assertion that the HLL estimate
    lands within its documented 5% relative error of the exact count.
    A sketch regression flips approx_ok to false and fails the hash, so
    the approximate path is driver-gated, not just pytest-gated. Both
    aggregates ride ONE pass; at 100 TB you'd drop exact_parts and trust
    the sketch (mergeable, fixed memory)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.05)
                - F.count_distinct("l_partkey")
            )
            / F.count_distinct("l_partkey")
            <= 0.05
        ).alias("approx_ok"),
    )


@query(
    "na_fill_bulk",
    oracle=f"""
    SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'UNK') AS flag,
           COUNT(*) AS n,
           ROUND(SUM(COALESCE(NULLIF(l_quantity, 1), 0)), {R}) AS sum_qty_filled
    FROM lineitem GROUP BY 1 ORDER BY flag
    """,
)
def na_fill_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk multi-column null fill (P8): sentinel→NULL on a string AND a
    numeric column, then ONE ``na.fill`` map repairs both — the
    reference's fillna contract (data_utils.py:239-247) without
    per-column passes. The fill is a pure projection (no shuffle); the
    aggregate below exists only to keep the checked result small."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .withColumn("l_returnflag", F.nullif("l_returnflag", F.lit("N")))
        .withColumn("l_quantity", F.nullif("l_quantity", F.lit(1)))
        .na.fill({"l_returnflag": "UNK", "l_quantity": 0})
    )
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), R).alias("sum_qty_filled"),
        )
        .orderBy("flag")
    )


@query(
    "join_dup_drop",
    oracle="""
    SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey,
           c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey < 200
    ORDER BY orderkey
    """,
)
def join_dup_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + duplicate-key-column drop (J3): the cross-named equi-join
    keeps both key columns; ``drop`` removes the right-hand copy so the
    output schema has one key, matching the reference's post-join column
    hygiene (data_utils.py:316-324)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    c = _t(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey, "inner").drop("c_custkey")
    return joined.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        "c_name",
        "c_mktsegment",
    ).orderBy("orderkey")


@query(
    "sql_correlated_above_nation_avg",
    oracle="""
    SELECT n_name, COUNT(*) AS n_above
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY n_name ORDER BY n_name
    """,
)
def sql_correlated_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL API surface: temp views + a correlated scalar
    subquery, planned by Catalyst as a de-correlated aggregate+join (no
    per-row re-execution). Customers above their own nation's average
    balance, counted per nation."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_above
        FROM v_customer c JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM v_customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY n_name ORDER BY n_name
        """
    )


# ---------------------------------------------------------------------------
# Analytic-window ranking family (W1 extension): ntile / percent_rank /
# cume_dist / dense_rank.  The reference only ever needs rank-1
# (data_utils.py:326-344); these complete the ranking surface a user of a
# general engine expects.  One shuffle total: all four functions share a
# single (partition, order) spec, so Catalyst plans ONE Window exchange.
# ---------------------------------------------------------------------------

@query(
    "window_ranking_funcs",
    oracle=f"""
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           NTILE(4)        OVER w AS bal_quartile,
           DENSE_RANK()    OVER w AS bal_dense_rank,
           ROUND(PERCENT_RANK() OVER w, {R}) AS bal_pct_rank,
           ROUND(CUME_DIST()    OVER w, {R}) AS bal_cume_dist
    FROM customer WHERE c_custkey <= 200
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY segment, custkey
    """,
)
def window_ranking_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/dense_rank/percent_rank/cume_dist over one shared window spec
    (single exchange; deterministic via unique c_custkey tiebreak)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            F.ntile(4).over(w).alias("bal_quartile"),
            F.dense_rank().over(w).alias("bal_dense_rank"),
            F.round(F.percent_rank().over(w), R).alias("bal_pct_rank"),
            F.round(F.cume_dist().over(w), R).alias("bal_cume_dist"),
        )
        .orderBy("segment", "custkey")
    )


@query(
    "grouping_sets_qty",
    oracle=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           ROUND(SUM(l_quantity), {R}) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY g_flag, g_status, returnflag NULLS FIRST, linestatus NULLS FIRST
    """,
)
def grouping_sets_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) with GROUPING()
    disambiguation of set-generated NULLs vs data NULLs — one Expand +
    one hash aggregate, same single-shuffle shape as a plain groupBy."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        f"""
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status,
               ROUND(SUM(l_quantity), {R}) AS sum_qty, COUNT(*) AS n
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY g_flag, g_status, returnflag NULLS FIRST,
                 linestatus NULLS FIRST
        """
    )


@query(
    "date_funcs",
    oracle=f"""
    SELECT o_orderkey AS orderkey,
           CAST(o_orderdate AS VARCHAR) AS order_date,
           EXTRACT(year FROM o_orderdate)    AS o_year,
           EXTRACT(quarter FROM o_orderdate) AS o_quarter,
           EXTRACT(month FROM o_orderdate)   AS o_month,
           EXTRACT(day FROM o_orderdate)     AS o_day,
           CAST(LAST_DAY(o_orderdate) AS VARCHAR)           AS month_end,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus_30d,
           DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS days_since_95
    FROM orders WHERE o_orderkey <= 400 ORDER BY orderkey
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function surface (F5 family): extract fields, month end,
    interval arithmetic, day difference — all JVM-side built-ins, dates
    stringified on both sides so DATE/TIMESTAMP repr drift can't flip the
    hash."""
    d = F.col("o_orderdate")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 400)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            d.cast("string").alias("order_date"),
            F.year(d).alias("o_year"),
            F.quarter(d).alias("o_quarter"),
            F.month(d).alias("o_month"),
            F.dayofmonth(d).alias("o_day"),
            F.last_day(d).cast("string").alias("month_end"),
            F.date_add(d, 30).cast("string").alias("plus_30d"),
            F.datediff(d, F.lit("1995-01-01").cast("date")).alias(
                "days_since_95"
            ),
        )
        .orderBy("orderkey")
    )


@query(
    "array_higher_order",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey, LIST(o_totalprice ORDER BY o_orderkey) AS prices
        FROM orders WHERE o_custkey <= 100 GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey,
           LEN(prices) AS n_orders,
           ROUND(LIST_AGGREGATE(prices, 'sum'), {R}) AS total,
           ROUND(LIST_MAX(prices), {R}) AS max_price,
           ROUND(LIST_MIN(LIST_TRANSFORM(prices, x -> x * 1.07)), {R})
               AS min_with_tax,
           LEN(LIST_FILTER(prices, x -> x > 100000)) AS n_big
    FROM per_cust ORDER BY custkey
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (the engine's array surface, used by
    the embedding ops in operators/similarity.py): collect → aggregate /
    transform / filter lambdas, all JVM-side (no Python UDF). Scalar
    outputs only, so the driver hash is list-layout-independent."""
    prices = F.array_sort(
        F.collect_list(F.struct("o_orderkey", "o_totalprice"))
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(prices.alias("ps"))
        .select(
            "custkey",
            F.size("ps").alias("n_orders"),
            F.round(
                F.aggregate(
                    "ps", F.lit(0.0), lambda acc, s: acc + s["o_totalprice"]
                ),
                R,
            ).alias("total"),
            F.round(
                F.array_max(F.transform("ps", lambda s: s["o_totalprice"])), R
            ).alias("max_price"),
            F.round(
                F.array_min(
                    F.transform("ps", lambda s: s["o_totalprice"] * 1.07)
                ),
                R,
            ).alias("min_with_tax"),
            F.size(
                F.filter("ps", lambda s: s["o_totalprice"] > 100000)
            ).alias("n_big"),
        )
        .orderBy("custkey")
    )


@query(
    "sql_exists_not_exists",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY custkey
    """,
)
def sql_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS correlated subqueries through the SQL API:
    customers with a 300k+ order but zero urgent orders. Catalyst
    de-correlates both into one left-semi and one left-anti hash join on
    o_custkey — the same physical shape as the DataFrame-API
    ``semi_join_big_spenders`` / ``anti_join_no_urgent``, proving the two
    front ends converge on one plan (no per-row subquery execution)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment
        FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM v_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        ORDER BY custkey
        """
    )


@query(
    "join_null_safe",
    oracle="""
    WITH fact AS (
      SELECT nullif(o_orderpriority, '1-URGENT') AS prio_key, o_totalprice
      FROM orders
    ),
    dim AS (SELECT DISTINCT prio_key FROM fact)
    SELECT d.prio_key, count(*)::BIGINT AS n_orders,
           round(sum(f.o_totalprice), 2) AS total
    FROM fact f JOIN dim d ON f.prio_key IS NOT DISTINCT FROM d.prio_key
    GROUP BY d.prio_key ORDER BY d.prio_key NULLS FIRST
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``eqNullSafe`` / SQL ``<=>``): NULL keys match
    NULL keys instead of silently dropping — the semantics a dimension
    with an 'unknown' member needs. Catalyst still plans it as a hash
    join (null-safe equality is hashable), so there's no nested-loop
    penalty; the NULL bucket is a single hot key, which at scale is the
    same salting story as any other skewed key."""
    fact = _t(spark, sf_dir, "orders").select(
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("prio_key"),
        "o_totalprice",
    )
    dim = fact.select("prio_key").distinct().withColumnRenamed("prio_key", "d_key")
    return (
        fact.join(dim, fact["prio_key"].eqNullSafe(dim["d_key"]))
        .groupBy("d_key")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(F.col("d_key").alias("prio_key"), "n_orders", "total")
        .orderBy(F.col("prio_key").asc_nulls_first())
    )


@query(
    "window_value_funcs",
    oracle=f"""
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           round(first_value(c_acctbal) OVER w, {R}) AS top_bal,
           round(nth_value(c_acctbal, 3) OVER w, {R}) AS third_bal,
           round(last_value(c_acctbal) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), {R}) AS bottom_bal
    FROM customer WHERE c_custkey <= 200
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY segment, custkey
    """,
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions (first_value / nth_value / last_value) over
    an unbounded frame: every row annotated with its segment's top,
    third, and bottom balance. One shared (partition, order) spec → one
    Window exchange; deterministic via the unique custkey tiebreak."""
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            F.round(F.first("c_acctbal").over(w), R).alias("top_bal"),
            F.round(F.nth_value("c_acctbal", 3).over(w), R).alias("third_bal"),
            F.round(F.last("c_acctbal").over(w), R).alias("bottom_bal"),
        )
        .orderBy("segment", "custkey")
    )


@query(
    "scalar_func_zoo",
    oracle="""
    SELECT o_orderkey,
           round(greatest(o_totalprice, 150000.0), 2) AS big,
           round(least(o_totalprice, 150000.0), 2) AS small,
           sign(o_totalprice - 150000.0)::INT AS over_under,
           (o_orderkey % 7)::BIGINT AS pm7,
           (o_orderkey & 255)::BIGINT AS low_byte,
           xor(o_orderkey, o_custkey)::BIGINT AS key_xor,
           (o_orderkey << 2)::BIGINT AS shl2,
           upper(to_hex(o_orderkey)) AS key_hex,
           round(sqrt(o_totalprice), 4) AS root_price,
           round(ln(o_totalprice), 4) AS ln_price
    FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey
    """,
)
def scalar_func_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth (F5 completion): comparison folds
    (greatest/least/sign), modular + bitwise arithmetic (pmod, AND, XOR,
    shifts), radix conversion (hex), and math (sqrt/ln) — all codegen'd
    JVM expressions inside one projection, no UDFs, filter pushed to the
    scan."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.round(F.greatest("o_totalprice", F.lit(150000.0)), 2).alias("big"),
        F.round(F.least("o_totalprice", F.lit(150000.0)), 2).alias("small"),
        F.signum(F.col("o_totalprice") - 150000.0).cast("int").alias("over_under"),
        F.pmod("o_orderkey", F.lit(7)).cast("long").alias("pm7"),
        F.expr("o_orderkey & 255").cast("long").alias("low_byte"),
        F.expr("o_orderkey ^ o_custkey").cast("long").alias("key_xor"),
        F.shiftleft("o_orderkey", 2).cast("long").alias("shl2"),
        F.hex("o_orderkey").alias("key_hex"),
        F.round(F.sqrt("o_totalprice"), 4).alias("root_price"),
        F.round(F.log("o_totalprice"), 4).alias("ln_price"),
    ).orderBy("o_orderkey")


@query(
    "cross_join_region_priority",
    oracle="""
    SELECT r.r_name, p.prio, r.r_name || '/' || p.prio AS cell
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderpriority AS prio
                              FROM orders) p
    ORDER BY r.r_name, p.prio
    """,
)
def cross_join_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product (``crossJoin``) of two bounded sets —
    the dimension-grid builder (every region × every priority) that
    reporting fills against. Safe ONLY because both sides are
    dimension-sized; the API makes the cardinality explosion explicit
    instead of Spark rejecting an accidental one."""
    r = _t(spark, sf_dir, "region").select("r_name")
    p = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("prio"))
        .distinct()
    )
    return (
        r.crossJoin(p)
        .select(
            "r_name",
            "prio",
            F.concat("r_name", F.lit("/"), "prio").alias("cell"),
        )
        .orderBy("r_name", "prio")
    )


@query(
    "unpivot_order_metrics",
    oracle="""
    SELECT o_orderkey, metric, round(val, 2) AS val
    FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'orderyear', extract(year FROM o_orderdate)::DOUBLE
      FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', o_custkey::DOUBLE FROM orders
    )
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey, metric
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of ``pivot_status_qty``: wide metric
    columns rotated into (key, metric, value) long form, the shape
    feature stores and metric pipelines ingest. Spark's native
    ``unpivot`` is a zero-shuffle Expand (each input row emits k output
    rows map-side), not a UNION of per-column scans — one pass over the
    table instead of three."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return (
        o.select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.year("o_orderdate").cast("double").alias("orderyear"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
        .unpivot(
            ids=["o_orderkey"],
            values=["custkey", "orderyear", "totalprice"],
            variableColumnName="metric",
            valueColumnName="_v",
        )
        .select("o_orderkey", "metric", F.round("_v", 2).alias("val"))
        .orderBy("o_orderkey", "metric")
    )


@query(
    "dq_profile_orders",
    oracle="""
    SELECT count(*)::BIGINT AS n_rows,
           count(o_custkey)::BIGINT AS custkey_nonnull,
           count(DISTINCT o_orderkey)::BIGINT AS orderkey_distinct,
           count(DISTINCT o_orderpriority)::BIGINT AS priority_card,
           round(min(o_totalprice), 2) AS price_min,
           round(max(o_totalprice), 2) AS price_max,
           count(*) FILTER (o_totalprice <= 0)::BIGINT AS price_nonpositive,
           count(*) FILTER (length(trim(o_orderpriority)) = 0)::BIGINT
             AS priority_blank
    FROM orders
    """,
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile: the constraint sweep (null rates, key
    uniqueness, category cardinality, bounds, blank strings) a pipeline
    runs before accepting a batch — ALL checks in ONE aggregation pass
    over one scan, so adding a check costs a column, not a job. Pairs
    with the anti-join referential check (`anti_join_no_urgent` shape)
    for cross-table constraints."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_orderkey").alias("orderkey_distinct"),
        F.countDistinct("o_orderpriority").alias("priority_card"),
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("price_nonpositive"),
        F.count(F.when(F.length(F.trim("o_orderpriority")) == 0, 1)).alias(
            "priority_blank"
        ),
    )


@query(
    "sql_pipe_syntax_rollup",
    oracle=f"""
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_pipe_syntax_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4 / the SQL:2023 `|>` operator chain):
    the same filtered rollup a classic SELECT expresses, written as a
    linear dataflow — scan |> filter |> aggregate |> order. Exercised
    through spark.sql so the engine's SQL front door (not just the
    DataFrame DSL) is under the oracle gate; Catalyst compiles both
    syntaxes to the identical plan, which the hash-match proves."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_pipe_orders"
    )
    return spark.sql(
        """
        FROM v_pipe_orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total_price
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


@query(
    "collation_case_insensitive_count",
    oracle=f"""
    WITH mixed AS (
      SELECT p_brand,
        CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE p_type END AS t
      FROM part
    )
    SELECT p_brand,
      count(*)::BIGINT AS n_rows,
      count(DISTINCT t)::BIGINT AS n_distinct_binary,
      count(DISTINCT lower(t))::BIGINT AS n_distinct_ci
    FROM mixed GROUP BY p_brand ORDER BY p_brand
    """,
)
def collation_case_insensitive_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """String COLLATIONS (Spark 4): distinct-counting a mixed-case
    column under the binary collation vs UTF8_LCASE. The engine side
    uses a real collated column — comparison semantics move INTO the
    type, where every operator (GROUP BY, DISTINCT, joins) picks them up
    consistently — while the oracle mirrors with lower(); the case
    variation is synthesized deterministically (even part keys
    uppercased) so ci < binary is guaranteed and hash-pinned."""
    part = load_table(spark, sf_dir, "part")
    mixed = part.select(
        "p_brand",
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.col("p_type"))
        .alias("t"),
    )
    return (
        mixed.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("t").alias("n_distinct_binary"),
            F.countDistinct(F.collate("t", "UTF8_LCASE")).alias(
                "n_distinct_ci"
            ),
        )
        .orderBy("p_brand")
    )


_BLOOM_PRIO = "1-URGENT"
_BLOOM_MIN_TOTAL = 250_000.0


@query(
    "join_runtime_bloom_pruned",
    oracle=f"""
    SELECT l.l_returnflag,
           count(*)::BIGINT AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '{_BLOOM_PRIO}'
      AND o.o_totalprice > {_BLOOM_MIN_TOTAL}
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def join_runtime_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim-filter join — the shape Spark's RUNTIME BLOOM
    FILTER exists for: a highly selective predicate on orders prunes the
    join, but lineitem's scan cannot see that predicate (it's on the
    OTHER table), so without a runtime filter the full fact table
    shuffles only to be discarded at the join.

    The plan is intentionally conf-driven, not hand-forced: at this SF
    the filtered orders side sits under the broadcast threshold and
    Catalyst correctly picks a BroadcastHashJoin (a bloom filter would
    be pure overhead — the broadcast hash set IS the perfect filter).
    At 100 TB both sides exceed broadcast, the planner falls to a
    shuffle join, and the default runtime-filter thresholds
    (creation side ≤ 10 MB after the selective predicate, application
    scan ≥ 10 GB) inject ``bloom_filter_might_contain(l_orderkey)``
    INTO THE LINEITEM SCAN, cutting the fact shuffle to near the match
    set. tests/test_plans.py forces the shuffle-join regime at local
    scale and asserts both the injection and result equality, so the
    scale behavior is pinned, not assumed."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == _BLOOM_PRIO)
        & (F.col("o_totalprice") > _BLOOM_MIN_TOTAL)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "sql_lateral_topk_per_nation",
    oracle="""
    SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS c_acctbal, t.rk
    FROM nation n
    JOIN LATERAL (
      SELECT c.c_custkey, c.c_acctbal,
             row_number() OVER (ORDER BY c.c_acctbal DESC, c.c_custkey)
               AS rk
      FROM customer c WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3
    ) t ON true
    ORDER BY n.n_name, t.rk
    """,
)
def sql_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table — the remaining SQL join form
    after correlated scalar subqueries (sql_correlated_above_nation_avg)
    and EXISTS (sql_exists_not_exists): a per-outer-row subquery in the
    FROM clause, here "top-3 customers by balance for each nation".
    Semantically the per-group top-k of flagship_top_customer_per_nation
    expressed the way SQL users port it from Postgres/DuckDB — the
    engine must accept the form, and Catalyst must DECORRELATE it
    (DomainJoin → window over the join domain) rather than re-running
    the subquery per outer row, which is what makes it safe at a
    100 TB outer table."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey,
               round(t.c_acctbal, 2) AS c_acctbal, t.rk
        FROM v_nation n
        JOIN LATERAL (
          SELECT c.c_custkey, c.c_acctbal,
                 row_number() OVER (ORDER BY c.c_acctbal DESC, c.c_custkey)
                   AS rk
          FROM v_customer c WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3
        ) t
        ORDER BY n.n_name, t.rk
        """
    )


@query(
    "sql_group_by_all_revenue",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*)::BIGINT AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderpriority, o_orderstatus
    """,
)
def sql_group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the analyst-ergonomics SQL form (group on
    every non-aggregate select item) that originated in DuckDB and
    landed in Spark 3.4+: the engine must infer the grouping key from
    the projection. Both engines run the SAME text here, so the pin
    covers inference parity, not just result parity. Plans identically
    to the explicit GROUP BY — one partial+final hash aggregate."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue,
               round(avg(o_totalprice), 2) AS avg_price
        FROM v_orders
        GROUP BY ALL
        ORDER BY o_orderpriority, o_orderstatus
        """
    )


_REC_STEPS = 20  # recursion depth cap (Spark's cteRecursionLevelLimit is 100)


@query(
    "sql_recursive_cte_balance",
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
      QUALIFY rn <= {_REC_STEPS}
    ),
    walk AS (
      SELECT user_id, rn,
             least(greatest(value, 0.0), 100.0) AS bal
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn,
             least(greatest(0.9 * w.bal + s.value, 0.0), 100.0) AS bal
      FROM walk w
      JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT user_id,
           count(*)::BIGINT AS n_steps,
           round(max_by(bal, rn), 4) AS final_balance
    FROM walk
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def sql_recursive_cte_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4.1) driving a genuinely sequential
    recurrence: per user, walk the first {_REC_STEPS} events in time
    order updating ``bal = clamp(0.9*bal + value, 0, 100)``. The clamp
    makes the recurrence NON-LINEAR — unlike a running sum, no window
    aggregate can express it, which is exactly the class of computation
    recursive CTEs exist for (the alternative is a driver-side loop of
    {_REC_STEPS} self-joins with unbounded lineage).

    Exercised through spark.sql so the recursion feature itself (a
    UnionLoop under the hood) is under the oracle gate against DuckDB's
    recursive CTE — identical UNION ALL semantics, identical float op
    order per user, so the hash must match. Scale shape: the windowed
    step table is materialized ONCE (eager localCheckpoint) before the
    recursion — a plain CTE reference would re-run the corpus window
    shuffle on EVERY iteration, the recursive-query scale killer; after
    that, each iteration joins the current frontier (one row per live
    user) to the rn-keyed step scan — frontier-sized work, never
    corpus-sized. Depth is capped by the rn <= {_REC_STEPS} predicate,
    well inside Spark's recursion level limit of 100."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _REC_STEPS)
        .select("user_id", "value", "rn")
        .localCheckpoint(eager=True)
    )
    seq.createOrReplaceTempView("v_rec_seq")
    return spark.sql(
        f"""
        WITH RECURSIVE seq AS (
          SELECT user_id, value, rn FROM v_rec_seq
        ),
        walk AS (
          SELECT user_id, rn,
                 least(greatest(value, 0.0D), 100.0D) AS bal
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.user_id, s.rn,
                 least(greatest(0.9D * w.bal + s.value, 0.0D), 100.0D) AS bal
          FROM walk w
          JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
        )
        SELECT user_id,
               count(*) AS n_steps,
               round(max_by(bal, rn), 4) AS final_balance
        FROM walk
        GROUP BY user_id
        ORDER BY user_id
        """
    )



# Render the constants into the docstring (help()/docs otherwise show
# literal braces that silently drift from the values — ADVICE r6).
format_doc(sql_recursive_cte_balance, _REC_STEPS=_REC_STEPS)

_KANON_K = 5  # minimum group size for a quasi-identifier class


@query(
    "dq_k_anonymity_profile",
    oracle=f"""
    WITH qid AS (
      SELECT c_nationkey,
             c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             count(*) AS grp
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey,
           count(*)::BIGINT AS n_classes,
           count(CASE WHEN grp < {_KANON_K} THEN 1 END)::BIGINT
             AS n_violating_classes,
           sum(grp)::BIGINT AS n_rows,
           sum(CASE WHEN grp < {_KANON_K} THEN grp ELSE 0 END)::BIGINT
             AS n_rows_to_suppress,
           min(grp)::BIGINT AS min_class_size
    FROM qid
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def dq_k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit over a quasi-identifier tuple — the release
    gate a training-data pipeline runs before publishing per-user
    derived tables: any (nationkey, segment, balance-band) equivalence
    class smaller than k={_KANON_K} re-identifies its members, and its
    rows must be suppressed or generalized. Reports, per nation, the
    class count, violating classes, and exactly how many rows a
    k-anonymous release would drop.

    Scale shape: two stacked aggregations sharing one logical ancestry —
    the class-size groupBy is the only corpus shuffle (map-side partials
    absorb the narrow QID key space), and the per-nation rollup reuses
    its output (a few thousand class rows at ANY corpus size). Nothing
    here is row-Python; the banding is arithmetic."""
    c = load_table(spark, sf_dir, "customer")
    qid = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("grp"))
    viol = F.col("grp") < _KANON_K
    return (
        qid.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.count(F.when(viol, 1)).alias("n_violating_classes"),
            F.sum("grp").alias("n_rows"),
            F.sum(F.when(viol, F.col("grp")).otherwise(F.lit(0))).alias(
                "n_rows_to_suppress"
            ),
            F.min("grp").alias("min_class_size"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# SQL session variables + EXECUTE IMMEDIATE (Spark 4 SQL scripting
# surface): DECLARE / SET VARIABLE with a data-derived value, consumed
# through a parameterized EXECUTE IMMEDIATE — the pattern behind
# orchestrated SQL workflows (compute a threshold once, reuse it across
# statements) without round-tripping values through the client.
# ---------------------------------------------------------------------------

@query(
    "sql_session_variables_param_query",
    oracle="""
    WITH cut AS (SELECT max(o_totalprice) * 0.5 AS v FROM orders)
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_big,
           SUM(CAST(FLOOR(o_totalprice * 1000) AS BIGINT)) / 1000.0
             AS revenue
    FROM orders, cut
    WHERE o_totalprice > cut.v
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_session_variables_param_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Orders above half the maximum order value, per priority — with
    the threshold computed ONCE into a session variable
    (DECLARE/SET VARIABLE, scalar-subquery initializer) and consumed by
    a parameter marker in EXECUTE IMMEDIATE ... USING.

    The revenue sum is fixed-point (floor(price·1e3) BIGINT, divided
    back) so the hash cannot drift by accumulation order. Scale shape:
    the variable SET is one scalar aggregate; the parameterized query
    then plans with the threshold as a LITERAL — which means the
    o_totalprice predicate is pushable to the parquet scan, the
    concrete advantage of resolve-then-plan over a runtime scalar
    subquery join. The EXECUTE IMMEDIATE string is constant; only the
    parameter travels, so there is no SQL-injection surface."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_ssv")
    spark.sql("DECLARE OR REPLACE VARIABLE v_big_order_cut DOUBLE")
    spark.sql(
        "SET VARIABLE v_big_order_cut = "
        "(SELECT max(o_totalprice) * 0.5 FROM v_orders_ssv)"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  count(*) AS n_big,
                  SUM(CAST(FLOOR(o_totalprice * 1000) AS BIGINT)) / 1000.0
                    AS revenue
           FROM v_orders_ssv
           WHERE o_totalprice > ?
           GROUP BY o_orderpriority
           ORDER BY o_orderpriority'
          USING v_big_order_cut
        """
    )
