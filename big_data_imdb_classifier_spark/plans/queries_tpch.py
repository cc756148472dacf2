"""Canonical TPC-H query suite, adapted to the driver testdata schema.

The testdata star schema (TESTDATA.md) is a column-subset of TPC-H —
no partsupp table, no l_commitdate / l_receiptdate / l_shipmode /
o_shippriority columns — so each query below is the standard TPC-H
shape re-targeted at the columns that exist (adaptations noted per
query). Q1 already ships as ``pricing_summary`` (queries_relational.py);
queries needing the partsupp table (Q2, Q9, Q11, Q16, Q20) live in
queries_tpch_ps.py over a deterministically DERIVED partsupp (round 7),
so the full 22-query suite is now covered.
Q12/Q21/Q22 ARE here, adapted the way Q4 already is: "late" is re-defined
from the columns that exist (shipped > N days after the order date, since
l_commitdate/l_receiptdate are absent), Q12's shipmode grouping becomes
the l_returnflag line class, and Q22's phone country code becomes
c_nationkey. Every non-partsupp TPC-H query is present.

Why this suite exists: the bespoke registry covers every operator, but
these are the *benchmark-standard compositions* an OLAP engine is judged
on — multi-fact join trees, correlated EXISTS, disjunctive scan
predicates, group-filter (HAVING) pipelines. Scale notes inline; the
common theme is that only genuinely-bounded dims (region/nation: ≤ 25
rows at ANY scale factor) get an explicit ``broadcast()``; part /
customer / supplier grow with SF, so their joins are left to AQE, which
broadcast-converts them at small SF and sort-merges (with runtime skew
split) at 100 TB.

Reference parity: the reference engine has no TPC-H suite; this module
maps to SURVEY.md §2.3/§2.4 (J1-J6, A1-A4) compositions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import ROUND_DIGITS as R
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q3 — Shipping Priority (o_shippriority column absent; projected out).
# ---------------------------------------------------------------------------

@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped high-value BUILDING orders.

    Plan at scale: the c_mktsegment filter prunes customer BEFORE the
    join (predicate pushdown to the parquet scan); orders⋈customer and
    lineitem⋈orders are fact joins handled by AQE; the top-10 is a
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    global sort."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_disc_price()), R).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 — Order Priority Checking (adapted: no l_commitdate/l_receiptdate;
# "late" is re-defined as shipped > 60 days after the order date).
# ---------------------------------------------------------------------------

@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders per priority with at least one late lineitem.

    The correlated EXISTS de-correlates to a LEFT SEMI join whose
    condition carries the non-equi date predicate alongside the key —
    Spark evaluates the equi part as the hash-join key and the date
    comparison as a join residual, so there is no post-join filter
    materializing matched rows. One semi-join shuffle + one agg
    shuffle on a 5-value key (map-side partials absorb everything)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5 — Local Supplier Volume.
# ---------------------------------------------------------------------------

@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue shipped by suppliers in the customer's own
    nation, per ASIA nation.

    Scale shape: region⋈nation collapses to a ≤25-row broadcast filter
    applied to customer (region predicate pushed through the dim chain
    BEFORE any fact join); the supplier join carries the
    s_nationkey = c_nationkey local-supplier condition as part of the
    join itself, not a post-filter. Fact-to-fact joins stay AQE-managed."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", F.col("n_name").alias("nation")
        )
    )
    c = _t(spark, sf_dir, "customer").join(
        asia_nations, F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("nation")
        .agg(F.round(F.sum(_disc_price()), R).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# ---------------------------------------------------------------------------
# Q6 — Forecasting Revenue Change.
# ---------------------------------------------------------------------------

@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT ROUND(SUM(l_extendedprice * l_discount), {R}) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue lost if small-quantity discounts were dropped.

    The whole query is a scan-local aggregate: all three predicates push
    down to the parquet scan (row-group min/max skip the out-of-range
    ship years entirely), and the single global sum needs only the
    2-column ReadSchema — the canonical "filter + project reach the
    scan" probe, asserted by the plan test."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), R).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Q10 — Returned Item Reporting (c_address/c_phone/c_comment absent;
# c_acctbal + nation retained).
# ---------------------------------------------------------------------------

@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue,
           ROUND(c.c_acctbal, {R}) AS acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a quarter.

    nation is the only explicit broadcast; the returnflag filter pushes
    to the lineitem scan (dictionary-encoded column → row-group skip);
    top-20 is TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(F.round(F.sum(_disc_price()), R).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", R).alias("acctbal"),
            "nation",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 — Promotion Effect (p_type here is a flat category; 'PROMO' exact
# match replaces the reference's 'PROMO%' prefix).
# ---------------------------------------------------------------------------

@query(
    "tpch_q14_promo_effect",
    oracle=f"""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
                   / SUM(l.l_extendedprice * (1 - l.l_discount)), {R}
           ) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: % of one month's revenue from promotional parts.

    part grows with SF (it is NOT hinted broadcast): AQE
    broadcast-converts it at small SF and sort-merges at 100 TB. The
    conditional sum folds into one aggregate pass — no separate
    promo/non-promo scans."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_disc_price()), R).alias(
                "promo_revenue_pct"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q18 — Large Volume Customer.
# ---------------------------------------------------------------------------

@query(
    "tpch_q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, b.l_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, {R}) AS totalprice,
           ROUND(b.total_qty, {R}) AS total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY totalprice DESC, b.l_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind the largest-quantity orders.

    The HAVING pre-aggregation runs FIRST and shrinks lineitem to the
    ~1% of orders above threshold before any join — the group-filter
    ordering that makes this query cheap at scale (join inputs are
    post-aggregation row counts, and the agg itself is map-side-partial
    on the natural lineitem clustering)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .filter(F.col("_tq") > 250)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", R).alias("totalprice"),
            F.round("_tq", R).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), "l_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — Discounted Revenue (no l_shipmode/l_shipinstruct/p_container:
# the three disjunctive arms keep their brand + size + quantity bands).
# ---------------------------------------------------------------------------

@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue,
           count(*) AS n_matched
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three disjunctive brand/size/quantity bands.

    The disjunction mixes part-only and lineitem-only sub-predicates:
    Catalyst extracts the per-side implied filters (p_brand IN (...) AND
    p_size <= 15; l_quantity BETWEEN 1 AND 30) and pushes them below the
    join, so both scans shrink before the hash join; the full residual
    evaluates on join output. That inferred-pushdown is the point of
    this query at 100 TB — the join sees ~3 brands of part, not all of
    it."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(arm)
        .agg(
            F.round(F.sum(_disc_price()), R).alias("revenue"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — Volume Shipping (nation names are the testdata's NATION_n).
# ---------------------------------------------------------------------------

@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate)::BIGINT AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.

    The two-nation disjunction over (supplier nation, customer nation) is
    applied as broadcast dim filters on BOTH fact paths before they meet:
    supplier and customer each join a 2-row nation slice, so the
    fact⋈fact joins carry only in-scope rows. Grouping key is 2×2×2
    values — the final shuffle is trivial regardless of SF."""
    nations = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nations.select(
            F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
        )),
        F.col("s_nationkey") == F.col("_snk"),
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(nations.select(
            F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
        )),
        F.col("c_nationkey") == F.col("_cnk"),
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_disc_price()), R).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — National Market Share (p_type is a flat category here).
# ---------------------------------------------------------------------------

@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT EXTRACT(year FROM o.o_orderdate)::BIGINT AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), {R}) AS mkt_share
    FROM all_nations GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of STANDARD-part volume sold
    into AMERICA, by order year.

    The customer-side region restriction collapses to a broadcast
    nation-key filter; the supplier-side nation name is carried as a
    broadcast dim column into the conditional aggregate — numerator and
    denominator come out of ONE aggregation pass, not two plans."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    america = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("_cnk")
        )
    )
    c = _t(spark, sf_dir, "customer").join(
        america, F.col("c_nationkey") == F.col("_cnk")
    )
    supp_nation = F.broadcast(
        n.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))
    )
    s = _t(spark, sf_dir, "supplier").join(
        supp_nation, F.col("s_nationkey") == F.col("_snk")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = _disc_price()
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(target) / F.sum(vol), R).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q13 — Customer Distribution (no o_comment column: the standard NOT LIKE
# exclusion is dropped; all orders count).
# ---------------------------------------------------------------------------

@query(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed how many orders (including
    zero — the LEFT join is the point of the query).

    Two aggregations, each one shuffle: orders→per-customer counts on
    c_custkey, then the count-of-counts on a key whose cardinality is
    the max order count (~tens) — the second shuffle is trivial. The
    left join preserves order-less customers; counting o_orderkey (not
    *) keeps them at 0."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q15 — Top Supplier.
# ---------------------------------------------------------------------------

@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(r.total_revenue, {R}) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    The scalar-max subquery is a broadcast of a 1-row aggregate over the
    ALREADY-aggregated per-supplier revenue (cardinality = |suppliers|),
    joined back without re-scanning lineitem — the revenue frame feeds
    both the max and the final filter, and AQE reuses its exchange."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", R).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — Small-Quantity-Order Revenue (no p_container: the brand filter
# alone selects the part slice).
# ---------------------------------------------------------------------------

@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, {R}) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost by dropping small-quantity orders of one
    brand's parts.

    The correlated per-part average de-correlates to ONE pre-aggregation
    of lineitem on l_partkey joined back on the key — Spark never
    re-executes the subquery per row. The brand filter restricts part
    first and semi-restricts both lineitem sides through the join, so
    the per-part averages are only computed for the brand's parts (the
    join with the filtered part table comes BEFORE the aggregation)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem")
    brand_li = li.join(p, li.l_partkey == p.p_partkey)
    avg_qty = (
        brand_li.groupBy(F.col("l_partkey").alias("_pk"))
        .agg((0.2 * F.avg("l_quantity")).alias("_thresh"))
    )
    return (
        brand_li.join(avg_qty, brand_li.l_partkey == F.col("_pk"))
        .where(F.col("l_quantity") < F.col("_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, R).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q12 — Shipping Modes and Order Priority (adapted: no l_shipmode /
# l_commitdate / l_receiptdate; the "mode" grouping becomes the
# l_returnflag line class and "shipped late" is l_shipdate more than
# 30 days after o_orderdate, mirroring Q4's 60-day adaptation).
# ---------------------------------------------------------------------------

@query(
    "tpch_q12_returnflag_priority",
    oracle="""
    SELECT l.l_returnflag AS lineclass,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag IN ('R', 'A')
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY lineclass
    """,
)
def tpch_q12_returnflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: late-line counts split by order priority per line class.

    Plan at scale: both date predicates on lineitem push down to the
    parquet scan (only the late-vs-orderdate comparison is a join
    residual, since it needs the orders side); the priority CASE folds
    into map-side partial aggregation on a 2-value key, so the agg
    shuffle moves ~4 rows per task regardless of SF. One fact-fact
    equi-join shuffle is the whole cost — AQE broadcast-converts the
    filtered lineitem side at small SF and sort-merges at 100 TB."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy(F.col("l_returnflag").alias("lineclass"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("lineclass")
    )


# ---------------------------------------------------------------------------
# Q21 — Suppliers Who Kept Orders Waiting (adapted: "late" is
# l_shipdate > o_orderdate + 60 days, exactly Q4's redefinition, since
# l_commitdate/l_receiptdate are absent).
# ---------------------------------------------------------------------------

@query(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lo l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n  ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_13'
      AND l1.is_late
      AND EXISTS (
        SELECT 1 FROM lo l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lo l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the sole-late supplier on multi-supplier 'F' orders.

    The double correlated EXISTS / NOT EXISTS does NOT become two extra
    self-joins here: both subqueries range over the same per-order
    lineitem population, so they de-correlate into ONE groupBy over that
    population — per order, the distinct-supplier count and the
    distinct-LATE-supplier count. The EXISTS is then ``n_supp > 1`` and
    the NOT EXISTS is ``n_late_supp = 1`` (the only late supplier is
    this one), checked as a post-join filter on the per-order stats.
    Cost at scale: the lineitem⋈orders('F') join runs twice (the two
    branches diverge after predicate pushdown, so the exchange is not
    reusable), then one agg on l_orderkey and one join back — two
    passes over pushdown-pruned base scans versus the naive plan's
    THREE lineitem self-join shuffles over unfiltered data. The
    supplier⋈nation dim join is broadcast (≤25 rows at any SF)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    lo = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "is_late"
        ),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("_n_supp"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "_n_late_supp"
        ),
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_13")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        lo.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .where((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — Global Sales Opportunity (adapted: no c_phone, so the phone
# country code becomes c_nationkey over a fixed 7-key set).
# ---------------------------------------------------------------------------

_Q22_KEYS = "(3, 7, 11, 15, 19, 21, 23)"


@query(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
    SELECT c.c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), {R}) AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN {_Q22_KEYS}
      AND c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2
        WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN {_Q22_KEYS}
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY c.c_nationkey
    ORDER BY cntrycode
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded, never-ordered customers per country code.

    The scalar AVG subquery is computed once and crossJoin-broadcast as
    a 1-row frame (Spark's own scalar-subquery planning does the same);
    the NOT EXISTS is a LEFT ANTI join against orders — no distinct
    needed on the probe side, anti-join short-circuits on first match.
    The IN-list predicate pushes to the customer scan on both branches.
    At 100 TB the anti-join is the only real shuffle; customer is the
    small side of it and AQE picks the broadcast direction."""
    keys = [3, 7, 11, 15, 19, 21, 23]
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(keys))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), R).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
