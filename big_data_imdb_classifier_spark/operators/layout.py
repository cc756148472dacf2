"""Multi-dimensional data layout: z-order (Morton) clustering.

THE data-layout lever for multi-dimensional filtering at 100 TB: a
single-column sort clusters perfectly on that column and not at all on
any other, while interleaving the bits of several columns gives every
interleaved column locality at once — files/row-groups then carry tight
min/max ranges on ALL of them, so format-level stats pruning (parquet
row-group skipping, file-level partition elimination) works for 2-D+
predicates instead of only the leading sort key. Same idea large lake
engines expose as `OPTIMIZE ... ZORDER BY`; here it is plain Spark:
pure-JVM bit arithmetic + repartitionByRange + sortWithinPartitions.

Everything is integer expression arithmetic (no UDFs, no doubles), so
the z-value is deterministic and cross-engine reproducible — the
registered ``zorder_bucket_profile`` query hash-matches a DuckDB oracle
built from the same unrolled bit expressions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale an integer column into [0, 2**bits) with INTEGER arithmetic
    only: ((x - min) * (2**bits - 1)) / (max - min), floor division.
    Integer ops keep the mapping exact and engine-portable (no
    float rounding at bucket boundaries); a constant column (max == min)
    maps to 0 everywhere."""
    span = cmax - cmin
    scaled = ((col - cmin) * F.lit((1 << bits) - 1)) / F.when(
        span > 0, span
    ).otherwise(F.lit(1))
    return F.floor(scaled).cast("long")


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide integers: bit i of x lands at
    position 2i, bit i of y at 2i+1. Unrolled into 2*bits shift/and/or
    JVM expressions — whole-stage-codegen folds it into one projection."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("z")


def zorder_sql(x: str, y: str, bits: int) -> str:
    """The SAME interleave as :func:`interleave_bits`, rendered as ANSI
    SQL (DuckDB-compatible) for oracle parity — generated from one
    shared ``bits`` constant so engine and oracle can't drift."""
    # Every term fully parenthesized: Postgres-family grammars (DuckDB
    # included) give <<, &, | ONE precedence level, left-associative —
    # an unparenthesized `a << 0 | b << 1` parses as `((a << 0) | b) << 1`.
    parts = []
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def with_zorder(
    df: DataFrame, col_x: str, col_y: str, bits: int = 8, out: str = "z"
) -> DataFrame:
    """Append a z-order column over two integer columns. Column domains
    are min/max-normalized to ``bits`` bits each (one tiny aggregate,
    folded in as a broadcast scalar row) before interleaving, so skewed
    or offset id ranges still fill the z-space."""
    bounds = df.agg(
        F.min(col_x).alias("_xmin"),
        F.max(col_x).alias("_xmax"),
        F.min(col_y).alias("_ymin"),
        F.max(col_y).alias("_ymax"),
    )
    z = interleave_bits(
        normalize_to_bits(
            F.col(col_x), F.col("_xmin"), F.col("_xmax"), bits
        ),
        normalize_to_bits(
            F.col(col_y), F.col("_ymin"), F.col("_ymax"), bits
        ),
        bits,
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, z)
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by z-order over (col_x, col_y):
    compute z, range-partition on it (contiguous z-ranges per file, the
    property stats pruning needs), sort within partitions, drop the
    helper column. The shuffle is paid ONCE at write; every subsequent
    2-D-filtered read skips non-overlapping files/row-groups via
    ordinary parquet min/max stats — no reader-side cooperation needed.
    """
    zdf = with_zorder(df, col_x, col_y, bits)
    (
        zdf.repartitionByRange(num_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a hash-bucketed (and bucket-sorted) parquet table.

    THE co-location lever for repeated big-big joins at 100 TB: both
    sides of a recurring join written with the same bucket count on the
    join key hash-agree file-by-file, so every later join between them
    needs NO shuffle exchange — the scan itself satisfies the join's
    required hash distribution (and with ``sort=True`` plus one file per
    bucket, the sort-merge join's sort requirement too). The shuffle is
    paid ONCE at write time instead of on every query.

    The pre-``repartition(buckets, key)`` uses the same Murmur3 hash as
    the bucket spec, so each bucket's rows land in exactly one task and
    each bucket is exactly ONE file — without it, every write task emits
    a file per bucket (tasks × buckets small files) and the per-bucket
    sort no longer yields globally sorted buckets.

    Bucketed metadata only round-trips through the catalog, hence
    ``saveAsTable`` with an explicit external ``path`` (plain
    ``.parquet(path)`` would silently drop the bucket spec)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def write_partitioned(df: DataFrame, path: str, part_col: str) -> None:
    """Write ``df`` as hive-layout parquet partitioned by ``part_col``.

    Directory-level partition elimination is the coarsest and cheapest
    pruning tier at 100 TB: a filter on the partition column never
    lists, opens, or reads non-matching directories (PartitionFilters in
    the scan node, applied by the file index before any I/O). The
    pre-``repartition(part_col)`` co-locates each partition value in one
    task so each directory holds ONE file instead of one per task — the
    classic small-files guard."""
    (
        df.repartition(F.col(part_col))
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(path)
    )
