"""Probabilistic record linkage (Fellegi & Sunter 1969, JASA 64:1183 —
the standard model behind every production entity-resolution system:
Splink, dedupe.io, census linkage).

A linkage run has three stages, each with a distinct scale shape:

1. **Blocking** — candidate pairs are generated only WITHIN blocks of
   agreeing coarse keys, never all-pairs (here (nationkey, segment)):
   pair count tracks Σ|block_A|·|block_B|, the knob a real pipeline
   tunes, and deliberately LOSES pairs whose blocking key was dirtied
   (measured as recall below — the honest cost of blocking).
2. **Field comparison → match weight** — per-field agreement adds
   log2(m/u) and disagreement adds log2((1−m)/(1−u)), where m is the
   P(agree | true match) and u the P(agree | non-match). The weights
   are module-level constants rounded to 6 digits and inlined as
   literals on BOTH engine sides, so the score arithmetic cannot drift.
3. **Decision** — pairs above the threshold are links; precision and
   recall are computable here because the dirty file is derived from
   the clean one with a known key offset (the ground truth every
   linkage benchmark needs).

The dirty file B is derived in-query from customer deterministically:
every 3rd key upper-cases the name (case-insensitive comparison must
recover it), every 5th shifts the balance by +7.25 (past the 0.5
tolerance — a true disagreement), every 7th dirties the blocking
segment (an unrecoverable blocking loss). No second table is needed and
the oracle replays the same derivation.

Reference parity: the reference has no linkage; this extends SURVEY §2
J-family (blocked join + conditional aggregation) for the
training-data-curation brief (entity resolution before dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import ROUND_DIGITS, query

# log2(m/u) agreement / log2((1-m)/(1-u)) disagreement weights,
# rounded to 6 digits and shared verbatim with the oracle SQL.
_W_NAME_A, _W_NAME_D = 9.891784, -4.320485   # m=0.95, u=0.001
_W_BAL_A, _W_BAL_D = 6.491853, -3.307429     # m=0.90, u=0.01
_BAL_TOL = 0.5
_BAL_SHIFT = 7.25  # exact binary (29/4): the %5 perturbation
_KEY_OFFSET = 10_000_000
_TAU = 6.0  # link threshold: name-agreement alone (9.89-3.31=6.58)
# clears it; balance-agreement alone (-4.32+6.49=2.17) does not.


@query(
    "linkage_fellegi_sunter",
    oracle=f"""
    WITH b AS (
      SELECT c_custkey + {_KEY_OFFSET} AS b_key,
             CASE WHEN c_custkey % 3 = 0 THEN upper(c_name)
                  ELSE c_name END AS b_name,
             c_acctbal + CASE WHEN c_custkey % 5 = 0
                              THEN {_BAL_SHIFT} ELSE 0 END AS b_bal,
             CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN'
                  ELSE c_mktsegment END AS b_seg,
             c_nationkey AS b_nat
      FROM customer
    ),
    pairs AS (
      SELECT a.c_custkey, a.c_nationkey, b.b_key,
             (lower(a.c_name) = lower(b.b_name)) AS name_agree,
             (abs(a.c_acctbal - b.b_bal) < {_BAL_TOL}) AS bal_agree
      FROM customer a
      JOIN b ON a.c_nationkey = b.b_nat AND a.c_mktsegment = b.b_seg
    ),
    scored AS (
      SELECT c_custkey, c_nationkey, b_key,
             (CASE WHEN name_agree THEN {_W_NAME_A}
                   ELSE {_W_NAME_D} END
              + CASE WHEN bal_agree THEN {_W_BAL_A}
                     ELSE {_W_BAL_D} END) AS w
      FROM pairs
    )
    SELECT c_nationkey AS nationkey,
           count(*)::BIGINT AS n_candidate_pairs,
           count(*) FILTER (w > {_TAU})::BIGINT AS n_links,
           count(*) FILTER (w > {_TAU}
                            AND b_key - {_KEY_OFFSET} = c_custkey)::BIGINT
             AS n_true_links,
           ROUND(count(*) FILTER (w > {_TAU}
                                  AND b_key - {_KEY_OFFSET} = c_custkey)
                 * 1.0 / greatest(count(*) FILTER (w > {_TAU}), 1),
                 {ROUND_DIGITS}) AS precision,
           ROUND(count(*) FILTER (w > {_TAU}
                                  AND b_key - {_KEY_OFFSET} = c_custkey)
                 * 1.0 / (SELECT count(*) FROM customer c2
                          WHERE c2.c_nationkey = scored.c_nationkey),
                 {ROUND_DIGITS}) AS recall
    FROM scored
    GROUP BY c_nationkey
    ORDER BY nationkey
    """,
)
def linkage_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Fellegi-Sunter linkage of customer against its derived
    dirty twin: per nation, candidate-pair volume, links above the
    weight threshold, true links, precision, and recall (recall < 1
    exactly where the blocking key was dirtied — the measured cost of
    blocking).

    Scale shape: candidate generation is ONE equi-join on the blocking
    key (nationkey, segment) — pair volume is Σ over blocks of
    |A_block|·|B_block|, never |A|·|B|; the field comparisons and the
    weight sum are codegen'd CASE arithmetic on join output; the
    decision + quality rollup is one aggregate on the ≤25-value nation
    key. The per-nation recall denominator is a broadcast of the
    per-nation customer counts (Spark plans the correlated scalar the
    same way the oracle's subquery reads). At 100 TB: blocking keys are
    chosen so blocks fit the shuffle partition budget; skewed blocks
    take the same salting/AQE treatment the skew rehearsal measures."""
    c = load_table(spark, sf_dir, "customer")
    b = c.select(
        (F.col("c_custkey") + _KEY_OFFSET).alias("b_key"),
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_name"))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        (
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") % 5 == 0, F.lit(_BAL_SHIFT))
            .otherwise(F.lit(0.0))
        ).alias("b_bal"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
        F.col("c_nationkey").alias("b_nat"),
    )
    pairs = c.join(
        b,
        (c.c_nationkey == b.b_nat) & (c.c_mktsegment == b.b_seg),
    )
    name_agree = F.lower("c_name") == F.lower("b_name")
    bal_agree = F.abs(F.col("c_acctbal") - F.col("b_bal")) < _BAL_TOL
    w = F.when(name_agree, F.lit(_W_NAME_A)).otherwise(
        F.lit(_W_NAME_D)
    ) + F.when(bal_agree, F.lit(_W_BAL_A)).otherwise(F.lit(_W_BAL_D))
    is_link = F.col("w") > _TAU
    is_true = is_link & (
        F.col("b_key") - _KEY_OFFSET == F.col("c_custkey")
    )
    scored = pairs.select("c_custkey", "c_nationkey", "b_key", w.alias("w"))
    per_nation_total = c.groupBy(
        F.col("c_nationkey").alias("_nk")
    ).agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        scored.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_candidate_pairs"),
            F.sum(F.when(is_link, 1).otherwise(0))
            .cast("long")
            .alias("n_links"),
            F.sum(F.when(is_true, 1).otherwise(0))
            .cast("long")
            .alias("n_true_links"),
        )
        .join(
            F.broadcast(per_nation_total),
            F.col("c_nationkey") == F.col("_nk"),
        )
        .select(
            F.col("c_nationkey").alias("nationkey"),
            "n_candidate_pairs",
            "n_links",
            F.col("n_true_links"),
            F.round(
                F.col("n_true_links")
                / F.greatest(F.col("n_links"), F.lit(1)),
                ROUND_DIGITS,
            ).alias("precision"),
            F.round(
                F.col("n_true_links") / F.col("_n_total"), ROUND_DIGITS
            ).alias("recall"),
        )
        .orderBy("nationkey")
    )
