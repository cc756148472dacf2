"""Source readers (SURVEY.md §2.1, S1-S6).

Every reader returns a lazy DataFrame with a declared schema — no
``inferSchema`` double-scans (reference anti-pattern, data_utils.py:119),
no driver-side ``json.load`` of whole files (reference anti-pattern,
data_utils.py:66-100).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TESTDATA_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table (columnar scan, pushdown-capable).

    Normalizes timestamp columns to plain ``TimestampType`` (LTZ)
    regardless of how the parquet file encodes them — the testdata's
    physical encoding has changed between driver rounds, so all three
    shapes are handled:

    - ``TIMESTAMP(NANOS)``: Spark can only scan nanos as nano-epoch longs
      (``spark.sql.legacy.parquet.nanosAsLong``); convert via integer
      division to microseconds — exactly DuckDB's nanos→micros truncation,
      so oracle comparisons agree.
    - ``TIMESTAMP(MICROS, isAdjustedToUTC=false)``: scanned as
      ``TIMESTAMP_NTZ``, which Spark refuses to cast to numeric types.
      Cast to LTZ. The session timezone is pinned to UTC first so the
      wall-clock field values are reinterpreted as UTC instants — the same
      thing DuckDB does when it runs ``epoch(ts)`` on a naive timestamp —
      independent of the host JVM's default zone.
    - ``TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=true)``: already LTZ,
      untouched.

    Each conversion is a codegen'd projection on top of the scan;
    pushdown/pruning on other columns is unaffected.

    ``sf_dir`` may also be a ``synthetic://`` URI (e.g.
    ``synthetic://?rows=10000000&seed=1&users=150000&partitions=64``), in
    which case the ``events``, ``documents`` and ``embeddings`` tables
    are served storage-free by the deterministic Python DataSources
    (sources/pyds.py) — the scale-rehearsal route to SFs bigger than
    any on-disk parquet. The events generator has no ``props`` column,
    so it is padded with NULLs to keep the declared schema (a
    props-consuming query run synthetically sees empty props — callers
    pick props-free queries).
    """
    if sf_dir.startswith("synthetic://"):
        return _load_synthetic_events(spark, sf_dir, name)
    # These are *runtime* SQL confs; set them on whatever session we are
    # handed (the driver contract passes in a vanilla session that did not
    # go through our factory — round-1 CORRECTNESS failure mode).
    for conf_key, conf_val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # NTZ→LTZ reinterpretation below must not depend on the host JVM's
        # default timezone (driver sessions inherit it).
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(conf_key, conf_val)
        except Exception:
            pass  # conf locked down (e.g. Spark Connect policy) — read may still work
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    declared = TESTDATA_SCHEMAS.get(name)
    if declared is not None:
        actual = dict(df.dtypes)
        for field in declared.fields:
            if not isinstance(field.dataType, T.TimestampType):
                continue
            scanned = actual.get(field.name)
            if scanned == "bigint":
                # integer `div`: float division would lose precision at
                # nano-epoch magnitudes (~1.7e18 > 2^53).
                df = df.withColumn(
                    field.name, F.expr(f"timestamp_micros({field.name} div 1000)")
                )
            elif scanned == "timestamp_ntz":
                # Session TZ is pinned UTC above, so this cast maps the
                # naive wall-clock to the identical UTC instant.
                df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def _load_synthetic_events(
    spark: SparkSession, uri: str, name: str
) -> DataFrame:
    """Serve ``events``/``documents``/``embeddings`` from the synthetic
    Python DataSources (sources/pyds.py). URI query params map onto the
    reader options — events keeps the round-4 names (rows/users/
    partitions/seed), documents and embeddings take ``doc_``/``emb_``
    prefixed row counts so ONE synthetic sf_dir can size all three
    tables independently::

        synthetic://?rows=1000000&users=15000&doc_rows=50000
                    &doc_base=5000&emb_rows=20000&emb_base=2000

    Session timezone is pinned UTC like the parquet path so event-time
    bucketing agrees across sources."""
    from urllib.parse import parse_qsl, urlparse

    from . import pyds

    pyds.register(spark)
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    opts = dict(parse_qsl(urlparse(uri).query))
    shared = {k: v for k, v in opts.items() if k in ("seed", "partitions")}
    if name == "events":
        reader = spark.read.format("synthetic_events")
        for k in ("rows", "users"):
            if k in opts:
                reader = reader.option(k, opts[k])
        for k, v in shared.items():
            reader = reader.option(k, v)
        # The generator has no props column; pad to the declared schema.
        return reader.load().withColumn("props", F.lit(None).cast("string"))
    if name == "documents":
        reader = spark.read.format("synthetic_documents")
        if "doc_rows" in opts:
            reader = reader.option("rows", opts["doc_rows"])
        if "doc_base" in opts:
            reader = reader.option("base_rows", opts["doc_base"])
        for k, v in shared.items():
            reader = reader.option(k, v)
        return reader.load()
    if name == "embeddings":
        reader = spark.read.format("synthetic_embeddings")
        if "emb_rows" in opts:
            reader = reader.option("rows", opts["emb_rows"])
        if "emb_base" in opts:
            reader = reader.option("base_rows", opts["emb_base"])
        if "dim" in opts:
            reader = reader.option("dim", opts["dim"])
        for k, v in shared.items():
            reader = reader.option(k, v)
        return reader.load()
    raise ValueError(
        "synthetic:// serves only events/documents/embeddings, "
        f"not {name!r}"
    )


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several testdata tables at once; defaults to all of them."""
    use = names or tuple(TESTDATA_SCHEMAS)
    return {n: load_table(spark, sf_dir, n) for n in use}


def load_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    null_value: str | None = "\\N",
    header: bool = True,
) -> DataFrame:
    """CSV scan with explicit schema (S1, reference data_utils.py:102-119).

    The IMDB '\\N' sentinel is handled at scan time via ``nullValue``
    instead of a post-hoc ``when(col == '\\N', None)`` projection
    (reference data_utils.py:239) — one less pass, and the scan output is
    already clean for casting.
    """
    reader = spark.read.schema(schema).option("header", header)
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    return reader.csv(path)


def load_csv_glob(
    spark: SparkSession, pattern: str, schema: T.StructType, **kw
) -> DataFrame:
    """Multi-file shard scan (S2).

    The reference globs on the driver and folds a loop of positional
    ``union`` calls (data_utils.py:121-157); Spark globs natively in the
    scan node, so N shards become one multi-file FileScan — no union
    operator, no driver listing, and partition planning sees all files.
    """
    return load_csv(spark, pattern, schema, **kw)


def load_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Record-oriented JSON scan (S3, reference data_utils.py:47-64)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if multiline:
        reader = reader.option("multiLine", True)
    return reader.json(path)


def load_column_dict_json(
    spark: SparkSession, path: str, columns: list[str], key_name: str = "_idx"
) -> DataFrame:
    """Column-dict JSON pivot (S4) — fully distributed.

    Input shape (reference ``imdb/directing.json``):
    ``{"movie": {"0": "tt..."}, "director": {"0": "nm..."}}`` — parallel
    index→value maps. The reference ``json.load``s the entire file on the
    driver and zips key-intersections in Python (data_utils.py:66-100).

    Spark-first: read the document as one row of MapType columns, explode
    each map to (index, value) rows, and inner-join the columns on the
    index — the join reproduces the reference's key-intersection
    semantics. Caveat: a multiLine JSON document is necessarily scanned
    as ONE row in ONE task, so the scan itself is single-task (bounded by
    one executor's memory — fine for the reference's ~400 KB file, not
    for a multi-GB one, which should be pre-split or stored columnar);
    the explicit repartition after the explode fans the exploded rows out
    so everything downstream of the scan is distributed.
    """
    doc_schema = T.StructType(
        [
            T.StructField(c, T.MapType(T.StringType(), T.StringType()), True)
            for c in columns
        ]
    )
    doc = spark.read.schema(doc_schema).option("multiLine", True).json(path)

    out: DataFrame | None = None
    for c in columns:
        col_df = doc.select(
            F.explode(F.col(c)).alias(key_name, c)
        ).repartition(key_name)
        out = col_df if out is None else out.join(col_df, key_name, "inner")
    assert out is not None
    return out.drop(key_name)


def load_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML scan via Spark 4's NATIVE xml data source (mainlined from
    spark-xml in 4.0 — no external package). ``row_tag`` names the
    repeating element that becomes one row; attributes surface as
    ``_attr`` columns, nested elements as structs.

    Pass ``schema`` in production: inference buys a full extra pass
    over the files, exactly like the CSV/JSON scans (reference reads
    its inputs with explicit dtypes for the same reason —
    /root/reference/movie_pipeline/data_loader.py). XML parsing is
    per-record CPU-heavy relative to columnar formats; the scan is
    still a distributed multi-file FileScan, but at 100 TB this is an
    INGEST-ONCE format — land it, convert to parquet, query the
    parquet (see sinks.compact_parquet for the follow-up step).
    """
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
