"""Data-layout queries: z-order (Morton) clustering profile.

The write-side operator lives in ``operators/layout.py`` (with_zorder /
write_zordered — repartitionByRange + sortWithinPartitions on the
interleaved key); this module registers the hash-gated arithmetic so a
regression in the bit interleave or the integer normalization fails the
driver's oracle gate, not just a pytest. The pruning EFFECTIVENESS claim
(z-ordered files touch fewer files under 2-D predicates than
single-column-sorted files) is a physical property of written files and
is proven by tests/test_plans.py::test_zorder_layout_prunes_more_files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import interleave_bits, normalize_to_bits, zorder_sql
from ..sources.readers import load_table
from .registry import query

_Z_BITS = 8  # 8 bits per dimension → 16-bit z, buckets = z >> 8


def _norm_sql(col: str, lo: str, hi: str) -> str:
    # Same integer arithmetic as operators.layout.normalize_to_bits:
    # ((x - min) * (2^bits - 1)) // max(span, 1). DuckDB `//` is floor
    # division; inputs are non-negative so it matches Spark's
    # floor((a*b)/c) exactly.
    top = (1 << _Z_BITS) - 1
    return f"((({col}) - {lo}) * {top}) // greatest({hi} - {lo}, 1)"


@query(
    "zorder_bucket_profile",
    oracle=f"""
    WITH b AS (
      SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
             min(l_suppkey) AS ymin, max(l_suppkey) AS ymax
      FROM lineitem
    ),
    z AS (
      SELECT {zorder_sql(_norm_sql('l_partkey', 'b.xmin', 'b.xmax'),
                         _norm_sql('l_suppkey', 'b.ymin', 'b.ymax'),
                         _Z_BITS)} AS zval,
             l_partkey, l_suppkey
      FROM lineitem, b
    )
    SELECT (zval >> {_Z_BITS})::BIGINT AS z_bucket,
           count(*)::BIGINT AS n_rows,
           min(l_partkey) AS min_partkey, max(l_partkey) AS max_partkey,
           min(l_suppkey) AS min_suppkey, max(l_suppkey) AS max_suppkey
    FROM z GROUP BY 1 ORDER BY 1
    """,
)
def zorder_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering profile of lineitem over (l_partkey,
    l_suppkey): normalize both keys to {_Z_BITS} bits with integer
    arithmetic, Morton-interleave, and profile the top-{_Z_BITS}-bit
    z-buckets (count + per-dimension min/max span). The per-bucket
    min/max spans are exactly the parquet row-group statistics a
    z-ordered write produces — tight on BOTH dimensions at once, which
    is what makes 2-D predicate pruning work where a single-column sort
    only prunes its leading key.

    Scale shape: one tiny min/max aggregate folded in as a broadcast
    scalar, one projection of unrolled shift/and/or JVM expressions
    (whole-stage codegen, no UDF, no doubles), one bucket-keyed
    aggregate. The engine and the DuckDB oracle render the SAME
    interleave from one shared bit-count constant
    (operators/layout.py: zorder_sql), so the arithmetic cannot drift
    silently."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    bounds = li.agg(
        F.min("l_partkey").alias("_xmin"),
        F.max("l_partkey").alias("_xmax"),
        F.min("l_suppkey").alias("_ymin"),
        F.max("l_suppkey").alias("_ymax"),
    )
    z = interleave_bits(
        normalize_to_bits(
            F.col("l_partkey"), F.col("_xmin"), F.col("_xmax"), _Z_BITS
        ),
        normalize_to_bits(
            F.col("l_suppkey"), F.col("_ymin"), F.col("_ymax"), _Z_BITS
        ),
        _Z_BITS,
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .withColumn("zval", z)
        .groupBy(
            F.shiftright("zval", _Z_BITS).cast("long").alias("z_bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
            F.min("l_suppkey").alias("min_suppkey"),
            F.max("l_suppkey").alias("max_suppkey"),
        )
        .orderBy("z_bucket")
    )
