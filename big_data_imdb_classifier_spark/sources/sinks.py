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


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> int:
    """Small-file compaction — the maintenance op every long-running
    ingest needs: rewrite a parquet dataset into ceil(bytes/target)
    files. Shrinking uses ``coalesce`` (narrow, NO shuffle: tasks just
    read several input files each); only growing the file count pays a
    round-robin ``repartition``. Sizes come from the Hadoop FileSystem
    API, so the same code paths work on HDFS/S3, not just local disk.
    At 100 TB you run this per partition directory (day=X) rather than
    on the whole table root — same function, scoped path. Returns the
    output file count. In-place compaction writes a sibling tmp dir and
    atomically renames, so readers never see a half-written dataset.
    """
    import math
    import os
    import shutil

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(path)
    out = (
        df.coalesce(n_files)
        if n_files <= df.rdd.getNumPartitions()
        else df.repartition(n_files)
    )
    dest = out_path or (path + ".compact.tmp")
    out.write.mode("overwrite").parquet(dest)
    if out_path is None:
        shutil.rmtree(path)
        os.rename(dest, path)
        dest = path
    return len(
        [f for f in spark.read.parquet(dest).inputFiles() if f.endswith(".parquet")]
    )


def write_clustered(df: DataFrame, path: str, cluster_col: str, files: int = 8) -> None:
    """Clustered parquet sink: range-partition on ``cluster_col`` then
    sort within each partition before writing. Files (and their row
    groups) end up with tight, near-disjoint min/max ranges on the
    cluster column, so predicate pushdown skips whole row groups at scan
    time — the single-column version of Z-ordering, and the highest-
    leverage layout choice for a column that queries filter by at 100 TB.
    ``sortWithinPartitions`` is a narrow (per-task) sort: the only
    shuffle is the range partitioning."""
    (
        df.repartitionByRange(files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_col(df: DataFrame, cols: list[str], bits: int = 8) -> F.Column:
    """Z-order (Morton) key over ``cols``: each column is mapped to an
    equi-depth bucket rank in [0, 2^bits) via approx-percentile
    boundaries (one tiny driver-side aggregate, folded into the plan as
    a literal array — same pattern as scalar imputation), then the
    bucket bits are interleaved JVM-side with shift/AND/OR. Rows close
    in z-value are close in EVERY clustered dimension, so range-
    partitioning on the z-value gives multi-column row-group skipping —
    what single-column clustering (write_clustered) cannot.
    No Python UDFs; the per-row cost is ``bits * len(cols)`` codegen'd
    bit ops plus one array filter per column."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), probs, 10_000).alias(c)
            for c in cols
        ]
    ).first()
    ranks = []
    for c in cols:
        bounds = [b for b in row[c] if b is not None]
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(c).cast("double")
        # equi-depth bucket id = number of boundaries <= value, in [0, 2^bits)
        ranks.append(
            F.least(
                F.size(F.filter(barr, lambda b: b <= v)), F.lit(n_buckets - 1)
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, b * len(ranks) + i))
    return z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], files: int = 16, bits: int = 8
) -> None:
    """Multi-column clustered parquet sink: range-partition + sort on the
    Morton key from ``zorder_col``. Every clustered column ends up with
    tight per-file min/max ranges, so predicates on ANY of them skip
    most row groups at scan time. One shuffle (the range partitioning);
    the sort is per-task."""
    zdf = df.withColumn("_z", zorder_col(df, cols, bits))
    (
        zdf.repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 native xml source, write side): one XML
    document per partition file with ``root_tag`` wrapping ``row_tag``
    elements. Executor-side like every file sink — no driver fan-in;
    interop surface for systems that ingest XML feeds, not a storage
    format to query at rest (convert to parquet for that)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )
