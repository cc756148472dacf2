"""Corpus-curation queries: benchmark decontamination + PII redaction.

Two training-data-pipeline steps the dedup/quality suites don't cover:

* **Decontamination** — before training, every corpus is screened for
  n-gram overlap against held-out evaluation sets, and contaminated
  documents are dropped (the step every serious LLM data pipeline runs
  between dedup and tokenization). Here the ``src0`` slice of the
  documents table stands in for the benchmark/eval set and the remaining
  sources are the training corpus.
* **PII redaction** — regex-based detect-and-mask of emails / phone
  numbers. The synthetic corpus contains no natural PII, so the query
  first INJECTS deterministic doc_id-derived PII into every document and
  then proves the redactor strips all of it (``residual_pii = 0``) —
  the same synthetic-harness pattern as the mock-LLM enrichment
  (operators/enrichment.py): the Spark-side mechanics are real and
  oracle-pinned, only the payload is synthesized.

Both queries are pure JVM column expressions (regexp / higher-order
array functions) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as TX
from ..sources.readers import load_table
from .registry import ROUND_DIGITS, query

# Must mirror queries_text.py's fragments (same tokenizer, same k=3
# shingles) so curation and dedup agree on what an n-gram is.
_TOKS = r"regexp_split_to_array(trim(text), '\s+')"
_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, len(t) - 2), "
    "i -> array_to_string(list_slice(t, i, i + 2), ' ')))"
)

_BENCH_SOURCE = "src0"
_CONTAM_THRESHOLD = 0.3

_EMAIL_RE = r"[\w.]+@[\w.]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-555-\d{4}"


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, source, {_SHINGLES} AS s FROM toks
    ),
    bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE source = '{_BENCH_SOURCE}'
    ),
    tr AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE source <> '{_BENCH_SOURCE}'
    )
    SELECT tr.doc_id,
           count(*) AS n_shingles,
           count(bench.g) AS n_contaminated,
           ROUND(count(bench.g) * 1.0 / count(*), {ROUND_DIGITS})
             AS contamination,
           count(bench.g) * 1.0 / count(*) >= {_CONTAM_THRESHOLD} AS flagged
    FROM tr LEFT JOIN bench ON tr.g = bench.g
    GROUP BY tr.doc_id
    ORDER BY tr.doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training doc, the fraction of its
    distinct word 3-grams that also occur anywhere in the held-out set;
    ``flagged`` docs (≥ 30% overlap — the planted near-dups of benchmark
    docs) are what a curation pipeline drops before training.

    Scale shape: eval sets are small by nature (thousands of docs, not
    billions), so the distinct benchmark-shingle table is broadcast and
    the training side never shuffles — one scan, one broadcast hash
    join, one groupBy on doc_id (which the explode preserves, so the agg
    is map-side-heavy). If the benchmark side ever outgrew broadcast,
    dropping the hint falls back to a shuffle join with no semantic
    change."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", TX.word_shingles_col("text", 3).alias("s")
    )
    bench = (
        TX.explode_no_refilter(
            sh.where(F.col("source") == _BENCH_SOURCE).select("s"), "s", "g"
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = TX.explode_no_refilter(
        sh.where(F.col("source") != _BENCH_SOURCE).select("doc_id", "s"), "s", "g"
    )
    contamination = F.count("_hit") / F.count(F.lit(1))
    return (
        tr.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
            F.round(contamination, ROUND_DIGITS).alias("contamination"),
            (contamination >= _CONTAM_THRESHOLD).alias("flagged"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_pii_redact",
    oracle=f"""
    WITH injected AS (
      SELECT source,
             text || ' contact user' || doc_id
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    ),
    red AS (
      SELECT source, t,
             regexp_replace(
               regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PHONE_RE}', '[PHONE]', 'g') AS r
      FROM injected
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(t, '{_EMAIL_RE}'))) AS BIGINT) AS n_emails,
           CAST(SUM(len(regexp_extract_all(t, '{_PHONE_RE}'))) AS BIGINT) AS n_phones,
           CAST(SUM(len(regexp_extract_all(r, '{_EMAIL_RE}'))
             + len(regexp_extract_all(r, '{_PHONE_RE}'))) AS BIGINT) AS residual_pii,
           CAST(SUM(length(r)) AS BIGINT) AS redacted_chars
    FROM red GROUP BY source ORDER BY source
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect-and-mask over the corpus: per source, how many
    emails/phones were found, proof the redacted text contains none
    (``residual_pii`` must be 0 — the invariant a privacy review needs),
    and the redacted character volume.

    The whole pass is scan → project (regexp_count / nested
    regexp_replace, all codegen'd JVM expressions) → one groupBy on the
    low-cardinality source key; map-side partials absorb everything, so
    at 100 TB this costs one read of the corpus and a 5-row shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    red = injected.withColumn(
        "r",
        F.regexp_replace(
            F.regexp_replace("t", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.regexp_count("t", F.lit(_EMAIL_RE))).alias("n_emails"),
            F.sum(F.regexp_count("t", F.lit(_PHONE_RE))).alias("n_phones"),
            F.sum(
                F.regexp_count("r", F.lit(_EMAIL_RE))
                + F.regexp_count("r", F.lit(_PHONE_RE))
            ).alias("residual_pii"),
            F.sum(F.length("r")).alias("redacted_chars"),
        )
        .orderBy("source")
    )
