"""Sinks (SURVEY.md §2.1, S5/S7/S8).

The reference's prediction sink collects every row to the driver and
formats Python strings (data_utils.py:419-459). Here the format happens in
the plan (`F.when` boolean formatting, reference data_utils.py:451-454
re-expressed as a column) and the write is distributed; `single_file=True`
reproduces the reference's one-TXT-file contract via coalesce(1), which is
fine for the tiny final output but optional for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bool_label_col(prediction_col: str = "prediction") -> F.Column:
    """`1.0 -> 'True' else 'False'` (reference data_utils.py:451-454)."""
    return F.when(F.col(prediction_col) == 1.0, F.lit("True")).otherwise(
        F.lit("False")
    )


def save_predictions_txt(
    df: DataFrame,
    path: str,
    order_col: str = "tconst",
    prediction_col: str = "prediction",
    single_file: bool = True,
) -> None:
    """Ordered True/False text sink (S7, reference data_utils.py:420-459).

    orderBy → format → write.text: the sort is a distributed range sort,
    the boolean formatting is a codegen'd projection, and only the file
    write is serialized (coalesce(1) on an already-tiny result).
    """
    out = (
        df.orderBy(order_col)
        .select(bool_label_col(prediction_col).alias("value"))
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def upsert_parquet_cache(df: DataFrame, existing: DataFrame | None, key: str) -> DataFrame:
    """Idempotent keyed-cache upsert (S5, reference data_utils.py:378-413).

    The reference rewrites a driver-side csv.DictWriter cache; here the
    cache merge is `unionByName + dropDuplicates(key)` — new rows win is
    not required by the reference (it never re-predicts cached keys), so
    plain duplicate-drop keeps either copy deterministically after the
    anti-join upstream guarantees disjoint keys.
    """
    if existing is None:
        return df
    return existing.unionByName(df).dropDuplicates([key])


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Bucketed parquet table sink: pre-shuffles data into ``buckets``
    hash buckets on ``key`` (optionally sorted within buckets) so that
    joins and aggregations on ``key`` between co-bucketed tables need NO
    exchange at read time — the shuffle is paid once at write time and
    amortized over every subsequent query. This is the canonical 100 TB
    fact⋈fact strategy when one side can't broadcast.

    ``path`` makes it an external table (data at path, metadata in the
    session catalog).
    """
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet sink: one directory per partition
    value, so date/tenant-scoped queries read only their partitions
    (partition pruning happens at planning time — see
    tests/test_plans.py::test_partitioned_write_prunes). The standard
    layout for append-mostly 100 TB fact tables."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)
