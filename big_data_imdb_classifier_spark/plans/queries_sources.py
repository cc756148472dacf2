"""Oracle-pinned queries for the source/sink components that were
pytest-only through round 6 (VERDICT r6 task 2): S2 multi-file glob
scan, S4 column-dict JSON pivot, F2 cross-column coalesce, F4 '\\N'
sentinel, F6 True/False boolean formatting + S7's global order contract.

Each query manufactures its fixture DETERMINISTICALLY from the driver
parquet tables during construction (once per session per sf_dir, under
a path keyed by applicationId so concurrent sessions never race), runs
the real reader/formatter machinery from sources/readers.py /
sources/sinks.py over the fixture, and hash-matches a DuckDB oracle
that recomputes the same result straight from the parquet views — the
fixture round-trip (CSV shards, column-dict JSON) must therefore be
lossless for the hash to match.

Reference parity: S2 ← data_utils.py:121-157 (glob+union shard load),
S4 ← data_utils.py:66-100 (directing.json column-dict pivot with
key-intersection), F2 ← classifier_pipeline.py title coalesce,
F4 ← data_utils.py:239 ('\\N' → NULL), F6/S7 ← data_utils.py:419-459
(ordered True/False prediction file).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import load_csv_glob, load_column_dict_json, load_table
from ..sources.sinks import bool_label_col
from .registry import format_doc, query

_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "sources",
)
# (applicationId, sf_dir, fixture-kind) -> path, built once per session
_built: dict[tuple[str, str, str], str] = {}


def _fixture_dir(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Per-session fixture root: the applicationId is part of the path so
    two concurrent sessions on the same sf_dir can never clobber each
    other's fixture mid-scan (the race ADVICE r6 flagged for the layout
    cache)."""
    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir).strip("_")
    return os.path.join(
        _CACHE_ROOT, spark.sparkContext.applicationId, f"{tag}_{kind}"
    )


# ---------------------------------------------------------------------------
# S2 + S1 + F4 + F2 — sharded CSV glob scan with sentinel repair.
# ---------------------------------------------------------------------------

_N_SHARDS = 8

_CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang_primary", T.StringType()),
        T.StructField("lang_fallback", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _ensure_csv_shards(spark: SparkSession, sf_dir: str) -> str:
    """Distributed write of documents as 8 CSV shards with '\\N'
    sentinels injected on a deterministic doc_id pattern (no driver
    collect — the writer is the cluster)."""
    key = (spark.sparkContext.applicationId, sf_dir, "csv_shards")
    if key in _built:
        return _built[key]
    path = _fixture_dir(spark, sf_dir, "csv_shards")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit("\\N"))
        .otherwise(F.col("lang"))
        .alias("lang_primary"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("\\N"))
        .otherwise(F.upper(F.col("lang")))
        .alias("lang_fallback"),
        "source",
        "n_chars",
    )
    (
        docs.repartition(_N_SHARDS)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )
    _built[key] = path
    return path


@query(
    "source_csv_glob_sentinel_repair",
    oracle="""
    SELECT CASE WHEN doc_id % 7 <> 0 THEN lang
                WHEN doc_id % 5 <> 0 THEN upper(lang)
                ELSE 'und' END AS lang_repaired,
           COUNT(*) AS n_docs,
           SUM(n_chars)::BIGINT AS total_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
)
def source_csv_glob_sentinel_repair(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sharded-CSV ingest pipeline: glob scan (S2) with explicit schema
    (S1), scan-time '\\N' sentinel nulling (F4), cross-column coalesce
    repair (F2), rollup.

    Construction writes documents as {_N_SHARDS} CSV shards with
    sentinels injected on deterministic doc_id patterns; the query
    reads them back through load_csv_glob — ONE multi-file FileScan,
    no union operator, nullValue='\\N' applied in the scan — and
    repairs the language with a genuine cross-column coalesce chain
    (primary → fallback → literal). The oracle recomputes the repair
    from the raw parquet, so a hash match proves the CSV shard
    round-trip, the glob planning, the sentinel nulling, and the
    coalesce precedence are all lossless. At 100 TB the glob scan is
    the same plan over N thousand shards — partition planning sees all
    files in one listing, and the repair is a codegen projection."""
    path = _ensure_csv_shards(spark, sf_dir)
    df = load_csv_glob(
        spark, os.path.join(path, "*.csv"), _CSV_SCHEMA, null_value="\\N"
    )
    return (
        df.select(
            F.coalesce(
                F.col("lang_primary"), F.col("lang_fallback"), F.lit("und")
            ).alias("lang_repaired"),
            "source",
            "n_chars",
        )
        .groupBy("lang_repaired")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("source").alias("n_sources"),
        )
        .orderBy("lang_repaired")
    )


# Render the shard count into the docstring (help() otherwise shows the
# literal brace placeholder — ADVICE r6 convention).
format_doc(source_csv_glob_sentinel_repair, _N_SHARDS=_N_SHARDS)


# ---------------------------------------------------------------------------
# S4 — column-dict JSON pivot with key-intersection semantics.
# ---------------------------------------------------------------------------

_DICT_KEY_CAP = 400  # bounded fixture slice (fixed row count at any SF)


def _ensure_columndict_json(spark: SparkSession, sf_dir: str) -> str:
    """Build a directing.json-shaped fixture from the customer table:
    parallel index→value maps where the 'segment' map is MISSING every
    third key, so the reader's key-intersection join is load-bearing.

    The driver-side build is bounded by construction (c_custkey <
    {_DICT_KEY_CAP} — a fixed count at any SF): the column-dict format
    is inherently one JSON document, the same shape and scale as the
    reference's ~400 KB directing.json; this mirrors the fixture, not
    an operator."""
    key = (spark.sparkContext.applicationId, sf_dir, "columndict")
    if key in _built:
        return _built[key]
    dirpath = _fixture_dir(spark, sf_dir, "columndict")
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, "customers_columndict.json")
    rows = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < _DICT_KEY_CAP)
        .select("c_custkey", "c_name", "c_mktsegment")
        .collect()
    )
    doc = {
        "name": {str(r.c_custkey): r.c_name for r in rows},
        "segment": {
            str(r.c_custkey): r.c_mktsegment
            for r in rows
            if r.c_custkey % 3 != 0
        },
    }
    with open(path, "w") as fh:
        json.dump(doc, fh)
    _built[key] = path
    return path


format_doc(_ensure_columndict_json, _DICT_KEY_CAP=_DICT_KEY_CAP)


@query(
    "source_columndict_pivot_rollup",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           MIN(c_name) AS first_name,
           MAX(c_name) AS last_name
    FROM customer
    WHERE c_custkey < {_DICT_KEY_CAP} AND c_custkey % 3 <> 0
    GROUP BY 1
    ORDER BY 1
    """,
)
def source_columndict_pivot_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Column-dict JSON pivot (S4): the pandas-orient='columns' document
    shape — parallel index→value maps — pivoted to rows by the
    DISTRIBUTED map-explode + index-join reader, then rolled up.

    The fixture deliberately drops every third key from the 'segment'
    map, so the rollup only hash-matches if the reader reproduces the
    reference's key-INTERSECTION semantics (data_utils.py:91): rows
    whose index exists in one map but not the other must vanish. The
    oracle recomputes the same slice relationally from the customer
    view. The reader's explode fans the single-document scan out to the
    cluster; everything after the scan is distributed (see
    load_column_dict_json's scale caveat for multi-GB documents)."""
    path = _ensure_columndict_json(spark, sf_dir)
    pivoted = load_column_dict_json(spark, path, ["name", "segment"])
    return (
        pivoted.groupBy(F.col("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("name").alias("first_name"),
            F.max("name").alias("last_name"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# F6 + S7 — boolean True/False formatting with the sink's global order
# contract pinned row-by-row.
# ---------------------------------------------------------------------------

_SINK_KEY_CAP = 2000
_SINK_THRESHOLD = 250000.0


@query(
    "sink_ordered_bool_format",
    oracle=f"""
    SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS line_no,
           CASE WHEN o_totalprice > {_SINK_THRESHOLD} THEN 'True'
                ELSE 'False' END AS label
    FROM orders
    WHERE o_orderkey < {_SINK_KEY_CAP}
    """,
)
def sink_ordered_bool_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prediction-sink line image (F6 + S7's order contract): the exact
    (line number, 'True'/'False') pairs save_predictions_txt would
    write, produced by the SAME bool_label_col formatter the sink uses
    (sources/sinks.py:19, reference data_utils.py:451-454).

    The driver compare is order-insensitive, so the sink's global sort
    is pinned by ASSOCIATION instead: row_number over the sink's order
    column makes every line's position part of the hashed value — a
    wrong sort (or a non-deterministic one) permutes labels against
    line numbers and breaks the hash. The row_number is one
    range-partitioned window over the pre-filtered slice; the boolean
    formatting is a codegen'd CASE projection, identical at any SF."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < _SINK_KEY_CAP
    )
    from pyspark.sql.window import Window

    labeled = o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > _SINK_THRESHOLD, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("prediction"),
    )
    return labeled.select(
        F.row_number()
        .over(Window.orderBy("o_orderkey"))
        .cast("long")
        .alias("line_no"),
        bool_label_col("prediction").alias("label"),
    )


# ---------------------------------------------------------------------------
# S3 — record-oriented JSON scan, oracle-pinned through a round-trip.
# ---------------------------------------------------------------------------

_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _ensure_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Distributed write of documents metadata as 4 JSON-lines shards
    (no driver fan-in)."""
    key = (spark.sparkContext.applicationId, sf_dir, "jsonl")
    if key in _built:
        return _built[key]
    path = _fixture_dir(spark, sf_dir, "jsonl")
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .repartition(4)
        .write.mode("overwrite")
        .json(path)
    )
    _built[key] = path
    return path


@query(
    "source_jsonl_roundtrip_rollup",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           SUM(n_chars)::BIGINT AS total_chars,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def source_jsonl_roundtrip_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Record-oriented JSON as a first-class source (S3): documents
    metadata is rewritten as JSON-lines shards (construction, once per
    session, distributed write) and the rollup runs on the JSON scan
    with an EXPLICIT schema via load_json, while the oracle reads the
    ORIGINAL parquet — the hash match proves the JSON round-trip
    (bigint / string typing included) is lossless and that no
    schema-inference pass is needed.

    Scale shape: a multi-file JSON scan is one FileScan exactly like
    CSV/parquet; the explicit schema skips the inference pass (a full
    extra read at 100 TB). JSON stays an INGEST format — the plan after
    the scan is identical to the parquet twin's."""
    from ..sources.readers import load_json

    path = _ensure_jsonl(spark, sf_dir)
    df = load_json(spark, path, _JSONL_SCHEMA)
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# XML round-trip (Spark 4 native xml source), oracle-pinned.
# ---------------------------------------------------------------------------

_XML_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


def _ensure_xml(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir, "xml")
    if key in _built:
        return _built[key]
    path = _fixture_dir(spark, sf_dir, "xml")
    from ..sources.sinks import write_xml

    write_xml(
        load_table(spark, sf_dir, "customer"),
        path,
        row_tag="customer",
        root_tag="customers",
    )
    _built[key] = path
    return path


@query(
    "source_xml_roundtrip_rollup",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) / 100.0
             AS total_balance,
           MIN(c_name) AS first_name,
           MAX(c_name) AS last_name
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
)
def source_xml_roundtrip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as an interop source/sink (Spark 4 NATIVE xml, no external
    package): customer is rewritten as XML documents (construction,
    once per session, executor-side writes) and the rollup runs on the
    XML scan with an explicit schema, while the oracle reads the
    ORIGINAL parquet — the hash proves the full type round-trip through
    the XML text encoding (bigint keys, double balances via a
    fixed-point sum so text→double re-parse cannot drift the hash,
    strings with '#' punctuation).

    Scale note: XML parsing is per-record CPU-heavy vs columnar
    formats; the scan is still a distributed multi-file FileScan, but
    at 100 TB this is an INGEST-ONCE format — land it, convert to
    parquet, query the parquet (the sink docstring's contract)."""
    from ..sources.readers import load_xml

    path = _ensure_xml(spark, sf_dir)
    df = load_xml(spark, path, row_tag="customer", schema=_XML_SCHEMA)
    return (
        df.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum(F.floor(F.col("c_acctbal") * 100).cast("long"))
                / 100.0
            ).alias("total_balance"),
            F.min("c_name").alias("first_name"),
            F.max("c_name").alias("last_name"),
        )
        .orderBy("segment")
    )
