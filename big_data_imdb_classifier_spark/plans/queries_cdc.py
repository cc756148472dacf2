"""Incremental-ingestion queries: CDC merge, SCD2 history, fuzzy entity
resolution.

The reference pipeline re-reads full snapshots every run
(classifier_pipeline.py end-to-end); a standing 100 TB corpus instead
ingests change batches. These queries exercise the canonical incremental
shapes over the testdata, each against a DuckDB oracle:

* ``cdc_merge_upsert`` — ANSI MERGE (update/insert/delete) via one
  full-outer join (operators/cdc.py:merge_upsert). The change batch is
  derived deterministically from ``orders`` (no RNG — driver hash gate).
* ``cdc_scd2_priority_history`` — SCD2 historization of each customer's
  order-priority change stream (operators/cdc.py:scd2_collapse);
  gaps-and-islands, all window passes sharing ONE hash exchange.
* ``fuzzy_match_levenshtein`` — entity resolution: deterministically
  corrupted part names matched back to the catalog via a BLOCKED
  edit-distance join (equi-join on a blocking key, never all-pairs —
  the same candidate-generation discipline as the MinHash/SimHash
  suites).
* ``fuzzy_join_fastss_d1`` — the recall-complete upgrade: FastSS
  deletion-neighborhood blocking, whose candidate equi-join provably
  misses NO pair within edit distance 1 (exhaustive-oracle pytest).
* ``cdc_scd2_pointintime_join`` — the consumption side of SCD2: facts
  attributed to the dimension version valid at their own timestamp via
  ONE union+carry window (no range join); oracle is DuckDB's native
  ASOF JOIN, an independent implementation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cdc import merge_upsert, scd2_collapse
from ..sources.readers import load_table
from .registry import query

_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "cdc_merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 0
    ),
    chg AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 <> 0 AND o_orderkey % 9 = 0
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN 'I'
                  WHEN o_orderkey % 9 = 0 THEN 'U'
                  ELSE 'D' END AS op
      FROM orders
      WHERE o_orderkey % 10 = 0 OR o_orderkey % 9 = 0 OR o_orderkey % 17 = 0
    )
    SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN c.op IS NOT NULL THEN c.o_custkey ELSE b.o_custkey END
             AS o_custkey,
           CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice
    FROM base b FULL JOIN chg c ON b.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    ORDER BY o_orderkey
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE over a deterministic CDC batch.

    Base = yesterday's snapshot (orders with ``key % 10 <> 0``); the
    change batch inserts the missing tenth (op I), doubles the price of
    the ``% 9`` rows (op U), and tombstones the remaining ``% 17`` rows
    (op D). One full-outer hash join resolves all three cases
    (operators/cdc.py:merge_upsert). Prices are scaled by exactly 2 so
    both engines compute bit-identical doubles — no rounding seam.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") % 10 != 0)
    k = F.col("o_orderkey")
    changes = o.filter((k % 10 == 0) | (k % 9 == 0) | (k % 17 == 0)).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.when((k % 10 != 0) & (k % 9 == 0), F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(k % 10 == 0, F.lit("I"))
        .when(k % 9 == 0, F.lit("U"))
        .otherwise(F.lit("D"))
        .alias("op"),
    )
    return merge_upsert(base, changes, keys=["o_orderkey"]).orderBy(
        "o_orderkey"
    )


@query(
    "cdc_scd2_priority_history",
    oracle=f"""
    WITH marked AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             CASE WHEN lag(o_orderpriority) OVER w
                       IS NOT DISTINCT FROM o_orderpriority
                  THEN 0 ELSE 1 END AS new_run
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
      SELECT o_custkey, o_orderpriority, o_orderdate,
             SUM(new_run) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ),
    collapsed AS (
      SELECT o_custkey, run_id, o_orderpriority,
             min(o_orderdate) AS vf, count(*)::BIGINT AS n_rows
      FROM runs GROUP BY 1, 2, 3
    )
    SELECT o_custkey, o_orderpriority,
           strftime(vf, '{_FMT_DUCK}') AS valid_from,
           strftime(lead(vf) OVER c, '{_FMT_DUCK}') AS valid_to,
           lead(vf) OVER c IS NULL AS is_current,
           n_rows
    FROM collapsed
    WINDOW c AS (PARTITION BY o_custkey ORDER BY run_id)
    ORDER BY o_custkey, run_id
    """,
)
def cdc_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each customer's order-priority stream: consecutive
    same-priority orders collapse into one validity interval; ``valid_to``
    is the next interval's start (null → current). Single shuffle on
    ``o_custkey`` shared by every window pass (operators/cdc.py:
    scd2_collapse)."""
    o = load_table(spark, sf_dir, "orders")
    hist = scd2_collapse(
        o,
        key="o_custkey",
        attr="o_orderpriority",
        order_by=[F.col("o_orderdate"), F.col("o_orderkey")],
        ts_col="valid_from",
    )
    return hist.select(
        "o_custkey",
        "o_orderpriority",
        F.date_format("valid_from", _FMT).alias("valid_from"),
        F.date_format("valid_to", _FMT).alias("valid_to"),
        "is_current",
        "n_rows",
    ).orderBy("o_custkey", "valid_from", "o_orderpriority")


@query(
    "fuzzy_match_levenshtein",
    oracle="""
    WITH names AS (
      SELECT p_name, min(p_partkey) AS match_key,
             substr(p_name, 1, 2) AS blk, length(p_name) AS len
      FROM part GROUP BY p_name
    ),
    dirty AS (
      SELECT p_partkey AS dirty_key,
             concat(substr(p_name, 1, 3 + p_partkey % (length(p_name) - 2) - 1),
                    substr(p_name, 3 + p_partkey % (length(p_name) - 2) + 1))
               AS dirty_name
      FROM part
    ),
    dnames AS (
      SELECT DISTINCT dirty_name, substr(dirty_name, 1, 2) AS blk FROM dirty
    ),
    cand AS (
      SELECT d.dirty_name, n.p_name, n.match_key,
             levenshtein(d.dirty_name, n.p_name) AS dist
      FROM dnames d JOIN names n ON d.blk = n.blk
      WHERE abs(length(d.dirty_name) - n.len) <= 1
        AND levenshtein(d.dirty_name, n.p_name) <= 2
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY dirty_name
                                   ORDER BY dist, match_key) AS rn
      FROM cand
    )
    SELECT dy.dirty_key, dy.dirty_name, b.match_key,
           b.p_name AS match_name, b.dist,
           dy.dirty_key = b.match_key AS matched_self
    FROM dirty dy JOIN best b
      ON b.dirty_name = dy.dirty_name AND b.rn = 1
    ORDER BY dy.dirty_key
    """,
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: candidates are generated over
    DISTINCT name variants, then mapped back to rows — never all-pairs,
    never all-rows.

    Each part name is corrupted deterministically (one character dropped
    at position ``3 + p_partkey % (len-2)``, so the 2-char blocking
    prefix survives). The match for a dirty ROW is a pure function of
    its dirty NAME, so the expensive stage runs on the deduplicated
    name vocabularies: equi-join distinct dirty variants to distinct
    catalog names on the blocking prefix, length-band residual BEFORE
    the levenshtein conjunct (codegen short-circuits, so the O(len²)
    distance runs only on length-plausible pairs), best name per variant
    by (distance, min catalog key). Two hash joins then fan the verdicts
    back out to rows.

    Scale shape: candidate volume is Σ_block |dirty-vocab_b| ×
    |catalog-vocab_b| — bounded by VOCABULARY sizes, independent of row
    count. The round-3 scaling study caught the row-level formulation
    going supralinear (0.65 s → 39 s across a 10× SF step: repeated
    names made blocks grow with N, so pairs grew ~N²); this dedup-first
    formulation is the standard ER discipline and holds the 10× step
    near-linear. Row fan-out joins hash on the name — a hot name is an
    ordinary skewed key (AQE skew split applies).
    """
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.min("p_partkey").alias("match_key"))
        .select(
            "p_name",
            "match_key",
            F.substring("p_name", 1, 2).alias("blk"),
            F.length("p_name").alias("len"),
        )
    )
    pos = (F.lit(3) + F.col("p_partkey") % (F.length("p_name") - 2)).alias(
        "pos"
    )
    dirty = (
        p.select("p_partkey", "p_name", pos)
        .select(
            F.col("p_partkey").alias("dirty_key"),
            F.concat(
                F.expr("substring(p_name, 1, pos - 1)"),
                F.expr("substring(p_name, pos + 1, length(p_name))"),
            ).alias("dirty_name"),
        )
    )
    dnames = dirty.select(
        "dirty_name", F.substring("dirty_name", 1, 2).alias("blk")
    ).distinct()
    cand = (
        dnames.join(names, on="blk")
        .filter(
            (F.abs(F.length("dirty_name") - F.col("len")) <= 1)
            & (F.levenshtein("dirty_name", "p_name") <= 2)
        )
        .select(
            "dirty_name",
            F.col("p_name").alias("match_name"),
            "match_key",
            F.levenshtein("dirty_name", "p_name").alias("dist"),
        )
    )
    w = Window.partitionBy("dirty_name").orderBy("dist", "match_key")
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        dirty.join(best, on="dirty_name")
        .select(
            "dirty_key",
            "dirty_name",
            "match_key",
            "match_name",
            "dist",
            (F.col("dirty_key") == F.col("match_key")).alias("matched_self"),
        )
        .orderBy("dirty_key")
    )


@query(
    "cdc_incremental_agg_maintenance",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 0
    ),
    chg AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 <> 0 AND o_orderkey % 9 = 0
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN 'I'
                  WHEN o_orderkey % 9 = 0 THEN 'U'
                  ELSE 'D' END AS op
      FROM orders
      WHERE o_orderkey % 10 = 0 OR o_orderkey % 9 = 0 OR o_orderkey % 17 = 0
    ),
    merged AS (
      SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN c.op IS NOT NULL THEN c.o_custkey ELSE b.o_custkey END
               AS o_custkey,
             CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
                  ELSE b.o_totalprice END AS o_totalprice
      FROM base b FULL JOIN chg c ON b.o_orderkey = c.o_orderkey
      WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT o_custkey, count(*)::BIGINT AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM merged GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def cdc_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: per-customer
    (order count, total spend) kept current under the SAME change batch
    as ``cdc_merge_upsert`` — WITHOUT rescanning the base table's rows.

    Each change contributes a signed delta — insert (+1, +price),
    update (0, new − old = +old price here, since updates double),
    delete (−1, −price) — and the standing aggregate absorbs the deltas
    with one groupBy over ``old aggregate ∪ deltas``. The oracle
    recomputes the aggregate from the fully merged snapshot, so the
    hash-match PROVES maintained == recomputed. At 100 TB this is the
    difference between shuffling a CDC batch and rescanning the fact
    table; count-zero groups are retired exactly as a real
    view-maintenance engine retires them.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    base_agg = (
        o.filter(k % 10 != 0)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("dn"),
            F.sum("o_totalprice").alias("dv"),
        )
    )
    is_ins = k % 10 == 0
    is_upd = (k % 10 != 0) & (k % 9 == 0)
    deltas = (
        o.filter(is_ins | is_upd | (k % 17 == 0))
        .select(
            "o_custkey",
            F.when(is_ins, F.lit(1))
            .when(is_upd, F.lit(0))
            .otherwise(F.lit(-1))
            .alias("dn"),
            F.when(is_ins, F.col("o_totalprice"))
            .when(is_upd, F.col("o_totalprice"))  # new(2p) - old(p) = +p
            .otherwise(-F.col("o_totalprice"))
            .alias("dv"),
        )
    )
    return (
        base_agg.unionByName(deltas)
        .groupBy("o_custkey")
        .agg(F.sum("dn").alias("n_orders"), F.sum("dv").alias("_v"))
        .filter(F.col("n_orders") > 0)
        .select(
            "o_custkey",
            "n_orders",
            F.round("_v", 2).alias("total_spend"),
        )
        .orderBy("o_custkey")
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 0
    ),
    merged AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 <> 0 AND o_orderkey % 9 = 0
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE NOT (o_orderkey % 10 <> 0 AND o_orderkey % 9 <> 0
                 AND o_orderkey % 17 = 0)
    )
    SELECT COALESCE(m.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'I'
                WHEN m.o_orderkey IS NULL THEN 'D'
                ELSE 'U' END AS op,
           m.o_totalprice AS new_totalprice,
           b.o_totalprice AS old_totalprice
    FROM base b FULL JOIN merged m ON b.o_orderkey = m.o_orderkey
    WHERE b.o_orderkey IS NULL OR m.o_orderkey IS NULL
       OR (b.o_custkey, b.o_orderstatus, b.o_totalprice)
          IS DISTINCT FROM (m.o_custkey, m.o_orderstatus, m.o_totalprice)
    ORDER BY o_orderkey
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the CDC INVERSE: given two versions of a table,
    reconstruct the minimal change log (insert / update with before+after
    image / delete) that turns one into the other. This is how pipelines
    without upstream CDC bootstrap incremental processing (and how
    dataset versions are audited).

    Round-trip property under the gate: ``merged`` here is exactly what
    ``cdc_merge_upsert`` produces, so the diff must recover that query's
    change batch minus no-op updates — the oracle encodes the same
    derivation, and a drift in either direction breaks the hash.

    Shape: ONE full-outer join on the key (same cost envelope as the
    merge itself); the value-tuple comparison uses null-safe struct
    inequality so NULL transitions diff correctly. No-op update rows are
    dropped distributedly — the change log is minimal by construction.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    base = o.filter(k % 10 != 0)
    merged = o.filter(
        ~((k % 10 != 0) & (k % 9 != 0) & (k % 17 == 0))
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.when((k % 10 != 0) & (k % 9 == 0), F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    m = merged.select([F.col(c).alias(f"__m_{c}") for c in merged.columns])
    j = base.join(
        m, F.col("o_orderkey").eqNullSafe(F.col("__m_o_orderkey")), "full_outer"
    )
    vals = ["o_custkey", "o_orderstatus", "o_totalprice"]
    changed = ~F.struct(*vals).eqNullSafe(
        F.struct(*[F.col(f"__m_{v}").alias(v) for v in vals])
    )
    in_base = F.col("o_orderkey").isNotNull()
    in_merged = F.col("__m_o_orderkey").isNotNull()
    return (
        j.filter(~in_base | ~in_merged | changed)
        .select(
            F.coalesce(F.col("__m_o_orderkey"), F.col("o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(~in_base, F.lit("I"))
            .when(~in_merged, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("__m_o_totalprice").alias("new_totalprice"),
            F.col("o_totalprice").alias("old_totalprice"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# FastSS deletion-neighborhood edit-distance join (Bocek et al. 2007,
# "Fast Similarity Search in Large Dictionaries"). The completeness
# upgrade over fuzzy_match_levenshtein's prefix blocking: prefix blocks
# MISS pairs whose edit falls in the first characters, while two strings
# within edit distance 1 ALWAYS share an element of their
# {self} ∪ single-deletions neighborhoods (substitution at i: delete i
# from both; insertion/deletion: the shorter IS a deletion variant of
# the longer) — so the equi-join on variants is recall-complete at d≤1,
# proven against an exhaustive all-pairs oracle in tests/test_cdc.py.
# ---------------------------------------------------------------------------


@query(
    "fuzzy_join_fastss_d1",
    oracle="""
    WITH clean AS (
      SELECT c_custkey AS k, c_name AS s FROM customer
    ),
    dirty AS (
      SELECT k AS dirty_key,
             substr(s, 1, k % length(s)) || substr(s, k % length(s) + 2) AS d
      FROM clean
    ),
    cv AS (
      SELECT k, s,
             unnest(list_append(
               [substr(s, 1, i - 1) || substr(s, i + 1)
                FOR i IN generate_series(1, length(s))], s)) AS v
      FROM clean
    ),
    dv AS (
      SELECT dirty_key, d,
             unnest(list_append(
               [substr(d, 1, i - 1) || substr(d, i + 1)
                FOR i IN generate_series(1, length(d))], d)) AS v
      FROM dirty
    ),
    cand AS (
      SELECT DISTINCT dv.dirty_key, dv.d, cv.k, cv.s
      FROM dv JOIN cv ON dv.v = cv.v
    )
    SELECT dirty_key,
           COUNT(*) AS n_candidates,
           COUNT(CASE WHEN levenshtein(d, s) <= 1 THEN 1 END) AS n_matches,
           MIN(CASE WHEN levenshtein(d, s) <= 1 THEN k END) AS best_match_key
    FROM cand
    GROUP BY dirty_key
    ORDER BY dirty_key
    """,
)
def fuzzy_join_fastss_d1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-complete edit-distance-1 join via deletion neighborhoods.

    Dirty names are customer names with one deterministically chosen
    character deleted (position key % len — no RNG). Both sides expand
    to their {self} ∪ single-deletion neighborhoods (len+1 variants per
    string, a JVM transform over sequence(), no UDF), candidates come
    from ONE equi-join on the variant string, and F.levenshtein verifies
    — reporting candidates AND verified matches per dirty name, so the
    candidate-bounding discipline is visible in the output.

    Scale shape: O(N·L) variant rows per side versus O(N²) all-pairs —
    the join key distributes by variant hash, the verify touches only
    candidate pairs, and per-variant bucket size is bounded by the
    alphabet (at most ~|Σ|·L strings can share a deletion variant), so
    no key is skew-prone at any corpus size. The same pattern scales to
    d≤k with k-deletion neighborhoods."""
    clean = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("s")
    )
    dirty = clean.select(
        F.col("k").alias("dirty_key"),
        F.expr(
            "concat(substr(s, 1, k % length(s)),"
            " substr(s, k % length(s) + 2))"
        ).alias("d"),
    )

    def neighborhood(df: DataFrame, col: str) -> DataFrame:
        variants = F.array_union(
            F.array(F.col(col)),
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    F.substring(F.col(col), F.lit(1), i - 1),
                    F.col(col).substr(i + 1, F.length(col)),
                ),
            ),
        )
        return df.withColumn("v", F.explode(variants))

    cand = (
        neighborhood(dirty, "d")
        .join(neighborhood(clean, "s"), "v")
        .select("dirty_key", "d", "k", "s")
        .distinct()
    )
    hit = F.levenshtein("d", "s") <= 1
    return (
        cand.groupBy("dirty_key")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count(F.when(hit, 1)).alias("n_matches"),
            F.min(F.when(hit, F.col("k"))).alias("best_match_key"),
        )
        .orderBy("dirty_key")
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time (temporal) join — the consumption side of the SCD2
# history cdc_scd2_priority_history builds: every fact row looks up the
# dimension version that was valid AT ITS OWN timestamp. The oracle uses
# DuckDB's native ASOF JOIN, so the engine's union+carry rendering is
# hash-pinned against an INDEPENDENT asof implementation.
# ---------------------------------------------------------------------------


@query(
    "cdc_scd2_pointintime_join",
    oracle="""
    WITH marked AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             CASE WHEN lag(o_orderpriority) OVER w
                       IS NOT DISTINCT FROM o_orderpriority
                  THEN 0 ELSE 1 END AS new_run
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    dim AS (
      SELECT o_custkey, o_orderdate AS valid_from,
             arg_max(o_orderpriority, o_orderkey) AS prio
      FROM marked WHERE new_run = 1
      GROUP BY o_custkey, o_orderdate
    ),
    probes AS (
      SELECT o.o_custkey AS ck, l.l_shipdate AS ts,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT coalesce(d.prio, 'NONE') AS prio_at_ship,
           count(*) AS n_lines,
           round(sum(p.rev), 4) AS revenue
    FROM probes p
    ASOF LEFT JOIN dim d ON p.ck = d.o_custkey AND p.ts >= d.valid_from
    GROUP BY 1 ORDER BY 1
    """,
)
def cdc_scd2_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup: each lineitem is attributed to the
    customer-priority REGIME valid at its ship date (latest change-run
    start ≤ l_shipdate) — the point-in-time join every SCD2 warehouse
    runs on every fact load.

    Scale shape: no range join and no per-row subquery — dimension
    version starts and fact probes UNION into one stream, ONE window per
    customer carries the last non-null version forward (markers sort
    before probes at equal timestamps, giving inclusive as-of semantics),
    and probes leave with their version attached. That is a single hash
    exchange on the entity key at any corpus size, versus the
    quadratic-prone interval join a naive BETWEEN formulation plans.
    The oracle is DuckDB's NATIVE ASOF JOIN — an independent
    implementation of the same semantics, so a tie-break or
    inclusivity drift fails the hash."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    marked = o.select(
        "o_custkey",
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
        F.when(
            F.lag("o_orderpriority").over(w).eqNullSafe(F.col("o_orderpriority")),
            0,
        )
        .otherwise(1)
        .alias("new_run"),
    )
    dim = (
        marked.where(F.col("new_run") == 1)
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("valid_from"),
        )
        .agg(F.max_by("o_orderpriority", "o_orderkey").alias("prio"))
    )
    probes = li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("ck"),
        F.col("l_shipdate").alias("ts"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    markers = dim.select(
        "ck",
        F.col("valid_from").alias("ts"),
        "prio",
        F.lit(0).alias("src"),
        F.lit(None).cast("double").alias("rev"),
    )
    stream = markers.unionByName(
        probes.select(
            "ck", "ts", F.lit(None).cast("string").alias("prio"),
            F.lit(1).alias("src"), "rev",
        )
    )
    cw = (
        Window.partitionBy("ck")
        .orderBy("ts", "src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = stream.withColumn(
        "prio_at_ship",
        F.coalesce(F.last("prio", ignorenulls=True).over(cw), F.lit("NONE")),
    ).where(F.col("src") == 1)
    return (
        attributed.groupBy("prio_at_ship")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("rev"), 4).alias("revenue"),
        )
        .orderBy("prio_at_ship")
    )
