"""Explicit StructType schemas for every source the engine reads.

The reference infers every schema at read time (`inferSchema=True`,
reference movie_pipeline/data_utils.py:102-119) which double-scans CSV and
breaks at scale; here every source gets a declared schema. Parquet carries
its own schema, but the declared ones are still used by the streaming
readers (readStream requires a schema) and by schema-assertion tests.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md) — TPC-H-ish star schema + events +
# documents + embeddings.
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": _st(("r_regionkey", T.LongType()), ("r_name", T.StringType())),
    "nation": _st(
        ("n_nationkey", T.LongType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.LongType()),
    ),
    "customer": _st(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.LongType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.LongType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _st(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _st(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _st(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _st(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)


# ---------------------------------------------------------------------------
# IMDB reference-format sources (SURVEY.md §1.2).
# ---------------------------------------------------------------------------

def imdb_train_schema(with_label: bool = True) -> T.StructType:
    """Schema of the reference train-*.csv shards (imdb/README.md:13-16).

    `_c0` is the unnamed integer index column; year/runtime/votes are read
    as strings because the raw files carry the IMDB '\\N' sentinel and are
    repaired/cast downstream (reference data_utils.py:237-242).
    """
    fields = [
        ("_c0", T.LongType()),
        ("tconst", T.StringType()),
        ("primaryTitle", T.StringType()),
        ("originalTitle", T.StringType()),
        ("startYear", T.StringType()),
        ("endYear", T.StringType()),
        ("runtimeMinutes", T.StringType()),
        ("numVotes", T.StringType()),
    ]
    if with_label:
        fields.append(("label", T.StringType()))
    return _st(*fields)


# writing.json: record-per-object {movie, writer} (reference data_utils.py:47-64)
IMDB_WRITING_SCHEMA = _st(("movie", T.StringType()), ("writer", T.StringType()))

# genre LLM cache CSV: {tconst, genre} (reference data_utils.py:378-413)
IMDB_GENRE_CACHE_SCHEMA = _st(("tconst", T.StringType()), ("genre", T.StringType()))
