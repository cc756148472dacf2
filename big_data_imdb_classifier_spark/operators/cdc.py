"""Change-data-capture operators: batch MERGE/upsert and SCD2 history.

The reference pipeline is snapshot-only — every run re-reads the full
inputs (classifier_pipeline.py end-to-end). A 100 TB production pipeline
cannot afford that: new/changed rows arrive as CDC batches and must be
merged into the standing tables incrementally. These operators supply the
two canonical shapes:

* ``merge_upsert`` — ANSI ``MERGE`` semantics (update matched, insert
  unmatched, delete on a tombstone flag) expressed as ONE full-outer
  hash join, which is the best a format-agnostic engine can do. At
  scale the join shuffles both sides once on the key; with a
  transactional table format (Delta/Iceberg/Hudi) the same logical
  merge prunes to only the files containing matched keys — this
  operator is the format-independent core of that.
* ``scd2_collapse`` — slowly-changing-dimension type-2 historization:
  collapse an ordered change stream of (key, attribute) into validity
  intervals via gaps-and-islands (two window passes + one aggregation,
  all sharing a single hash partitioning on the key → one shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """MERGE ``changes`` into ``base`` on ``keys``.

    Semantics (ANSI MERGE):

    * change row with ``op_col == delete_op`` and a base match → row dropped;
    * any other change row → its values win (update if matched, insert if not);
    * base rows with no change → carried through unchanged.

    Both sides must share the same value columns (beyond ``op_col``).
    Plan shape: one full-outer ``SortMergeJoin``/``ShuffledHashJoin`` on
    the key — a single shuffle per side, AQE-coalesced. CDC batches are
    usually ≪ base, so the shuffle of ``changes`` is trivial; the base
    shuffle is the unavoidable cost of a format-agnostic merge (a
    transactional table format would prune it to matched files).
    """
    value_cols = [c for c in changes.columns if c not in (*keys, op_col)]
    # Prefix-rename the change side up front: base and changes often share
    # lineage (CDC batches are projections of the same table), and
    # alias-qualified self-join references are ambiguous to the analyzer.
    pre = changes.select(
        [F.col(c).alias(f"__c_{c}") for c in changes.columns]
    )
    cond = [F.col(k).eqNullSafe(F.col(f"__c_{k}")) for k in keys]
    joined = base.join(pre, on=cond, how="full_outer")
    matched_change = F.col(f"__c_{op_col}").isNotNull()
    out = joined.filter(
        ~matched_change | (F.col(f"__c_{op_col}") != F.lit(delete_op))
    ).select(
        *[F.coalesce(F.col(f"__c_{k}"), F.col(k)).alias(k) for k in keys],
        *[
            F.when(matched_change, F.col(f"__c_{v}"))
            .otherwise(F.col(v))
            .alias(v)
            for v in value_cols
        ],
    )
    return out


def scd2_collapse(
    df: DataFrame,
    key: str,
    attr: str,
    order_by: Sequence[Column | str],
    ts_col: str = "valid_from",
) -> DataFrame:
    """Collapse an ordered per-key change stream into SCD2 intervals.

    Consecutive rows with the same ``attr`` value merge into one interval;
    ``valid_from`` is the first ordering timestamp of the run,
    ``valid_to`` the next run's start (null while current), plus
    ``is_current`` and the run's row count.

    Gaps-and-islands: ``lag`` marks run starts, a running sum numbers the
    runs, one aggregation collapses them, ``lead`` closes the intervals.
    All four passes partition by ``key`` → Catalyst reuses ONE hash
    exchange (the same single-shuffle shape proven for
    ``count_enrich`` in tests/test_plans.py).
    """
    seq = Window.partitionBy(key).orderBy(*order_by)
    runs = (
        df.withColumn(
            "_new_run",
            F.when(
                F.lag(attr).over(seq).eqNullSafe(F.col(attr)), F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("_run_id", F.sum("_new_run").over(seq))
    )
    collapsed = runs.groupBy(key, "_run_id", attr).agg(
        F.min(order_by[0]).alias(ts_col),
        F.count(F.lit(1)).alias("n_rows"),
    )
    close = Window.partitionBy(key).orderBy("_run_id")
    return (
        collapsed.withColumn("valid_to", F.lead(ts_col).over(close))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_run_id")
    )
