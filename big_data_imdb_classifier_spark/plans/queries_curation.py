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
from .registry import ROUND_DIGITS, format_doc, query

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


_Q_THRESHOLD = 0.5
_SAMPLE_NUM, _SAMPLE_DEN = 1, 4

# Near-dup LSH/connected-components CTE chain over the EXACT-DEDUP
# SURVIVORS (stage s1) — same banding as queries_text._LSH_CTES, but the
# base relation is the funnel's previous stage rather than the raw table.
_E2E_ND_CTES = """
    sh0 AS MATERIALIZED (SELECT doc_id, {shingles} AS s FROM r WHERE in_exact),
    sig AS MATERIALIZED (
      SELECT doc_id, s, {mh_cols}
      FROM sh0
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, 0 AS band, md5(mh_0 || '|' || mh_1) AS bh FROM sig
      UNION ALL SELECT doc_id, 1, md5(mh_2 || '|' || mh_3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(mh_4 || '|' || mh_5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(mh_6 || '|' || mh_7) FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    strong AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sh0 x ON x.doc_id = c.doc_a
      JOIN sh0 y ON y.doc_id = c.doc_b
      WHERE len(list_intersect(x.s, y.s))::DOUBLE
            / greatest(len(list_distinct(list_concat(x.s, y.s))), 1) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM strong
      UNION SELECT doc_b, doc_a FROM strong
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS node, least(min(v), u) AS component
      FROM reach GROUP BY u
    )"""


def _e2e_oracle() -> str:
    from .queries_text import _QUALITY_SQL

    mh_cols = ", ".join(
        f"list_min(list_transform(s, x -> md5('{i}:' || x))) AS mh_{i}"
        for i in range(8)
    )
    nd = _E2E_ND_CTES.format(shingles=_SHINGLES, mh_cols=mh_cols)
    return f"""
    WITH RECURSIVE
    tk AS MATERIALIZED (
      SELECT doc_id, source, text, {_TOKS} AS t, md5(trim(text)) AS fp
      FROM documents
    ),
    r AS MATERIALIZED (
      SELECT *,
        row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS in_exact
      FROM tk
    ),{nd},
    f1 AS (
      SELECT r.*,
        in_exact AND doc_id NOT IN
          (SELECT node FROM comp WHERE node <> component) AS in_nd
      FROM r
    ),
    f2 AS MATERIALIZED (
      SELECT *, in_nd AND {_QUALITY_SQL} >= {_Q_THRESHOLD} AS in_q FROM f1
    ),
    bench AS (
      SELECT DISTINCT unnest(s) AS g FROM (
        SELECT {_SHINGLES} AS s FROM (
          SELECT {_TOKS} AS t FROM documents WHERE source = '{_BENCH_SOURCE}'
        )
      )
    ),
    tr AS (
      SELECT doc_id, unnest(s) AS g FROM (
        SELECT doc_id, {_SHINGLES} AS s
        FROM f2 WHERE in_q AND source <> '{_BENCH_SOURCE}'
      )
    ),
    contam AS (
      SELECT tr.doc_id, count(bench.g) * 1.0 / count(*) AS c
      FROM tr LEFT JOIN bench ON tr.g = bench.g
      GROUP BY tr.doc_id
    ),
    f3 AS (
      SELECT f2.*,
        in_q AND source <> '{_BENCH_SOURCE}'
             AND coalesce(c, 0) < {_CONTAM_THRESHOLD} AS in_dc
      FROM f2 LEFT JOIN contam USING (doc_id)
    ),
    f4 AS (
      SELECT *,
        in_dc AND CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
                  % {_SAMPLE_DEN} < {_SAMPLE_NUM} AS in_s
      FROM f3
    ),
    agg AS (
      SELECT
        count(*)::BIGINT AS d0, CAST(sum(len(t)) AS BIGINT) AS t0,
        count(*) FILTER (in_exact)::BIGINT AS d1,
          CAST(sum(len(t)) FILTER (in_exact) AS BIGINT) AS t1,
        count(*) FILTER (in_nd)::BIGINT AS d2,
          CAST(sum(len(t)) FILTER (in_nd) AS BIGINT) AS t2,
        count(*) FILTER (in_q)::BIGINT AS d3,
          CAST(sum(len(t)) FILTER (in_q) AS BIGINT) AS t3,
        count(*) FILTER (in_dc)::BIGINT AS d4,
          CAST(sum(len(t)) FILTER (in_dc) AS BIGINT) AS t4,
        count(*) FILTER (in_s)::BIGINT AS d5,
          CAST(sum(len(t)) FILTER (in_s) AS BIGINT) AS t5
      FROM f4
    )
    SELECT stage_ord, stage, n_docs, n_tokens,
           round(n_docs * 1.0 / d0, {ROUND_DIGITS}) AS retained_frac
    FROM (
      SELECT 0 AS stage_ord, 'raw' AS stage, d0 AS n_docs, t0 AS n_tokens, d0 FROM agg
      UNION ALL SELECT 1, 'exact_dedup', d1, t1, d0 FROM agg
      UNION ALL SELECT 2, 'near_dedup', d2, t2, d0 FROM agg
      UNION ALL SELECT 3, 'quality', d3, t3, d0 FROM agg
      UNION ALL SELECT 4, 'decontaminated', d4, t4, d0 FROM agg
      UNION ALL SELECT 5, 'sampled', d5, t5, d0 FROM agg
    )
    ORDER BY stage_ord
    """


@query("corpus_curation_e2e", oracle=_e2e_oracle())
def corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE COMPOSED CURATION PIPELINE: the five stages every large-scale
    training-data recipe runs, chained into one DAG over one corpus scan
    lineage, reported as a per-stage retention funnel —

      raw → exact dedup (min-id per md5 fingerprint)
          → near-dup dedup (MinHash-LSH pairs ≥ 0.5 Jaccard → connected
            components → drop non-representatives; computed ON the
            exact-dedup survivors, as a real pipeline would)
          → quality filter (score ≥ 0.5, same scorer as
            quality_filter_stats)
          → decontamination (drop the held-out '{bench}' source and any
            training doc with ≥ {thr:.0%} 3-gram overlap against it;
            docs too short to shingle count as clean on both engines)
          → deterministic 1/{den} hash sample (same predicate as
            sample_by_hash_quarter).

    Output: (stage_ord, stage, n_docs, n_tokens, retained_frac) — the
    audit table a data-engineering review reads before a training run.

    Plan shape: stage membership is computed as BOOLEAN FLAG COLUMNS on
    one doc-id-keyed frame (monotone conjunctions), so the funnel is ONE
    final aggregation — not six branch re-scans. The only joins are the
    near-dup loser list and the per-doc contamination stats, both joined
    back by doc_id; the bench shingle set is broadcast exactly as in
    decontaminate_ngram_overlap. At 100 TB you'd persist the flagged
    frame (doc_id + 5 booleans + token count — bytes per row) before the
    LSH branch and the final agg; here lineage recompute is cheaper than
    eviction.

    Every stage reuses the SAME operator the standalone query uses
    (fingerprint_col, minhash_lsh_near_dup_pairs,
    connected_components_min_label, quality_score_col, sample_by_hash's
    predicate), so the funnel hash-matching its recursive-CTE oracle also
    re-verifies the operators compose."""
    from .queries_text import _SW, _scan_partitions_estimate

    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    # Scan width from file metadata, not df.rdd.getNumPartitions() —
    # the RDD round-trip compiled the whole plan on the driver at every
    # construction (round 9; same fix as queries_text._docs).
    est = _scan_partitions_estimate(spark, sf_dir, "documents")
    if est < spark.sparkContext.defaultParallelism:
        docs = TX.repartition_for_cpu(docs, "doc_id")

    base = docs.select(
        "doc_id",
        "source",
        "text",
        TX.token_count_col("text").alias("_nt"),
        TX.fingerprint_col("text").alias("_fp"),
    )
    w = Window.partitionBy("_fp").orderBy("doc_id")
    # NOT persisted: the frame feeds three consumers (LSH branch,
    # contamination branch, final aggregate), but materializing it as an
    # InMemoryRelation defeats column pruning into each branch (every
    # consumer would scan the full text-carrying cache) and measured
    # ~1.5× slower than letting each branch replay the pruned scan +
    # fingerprint window. Re-scan beats eviction — same call as
    # stats_mad_outliers' three-pass shape.
    b1 = base.withColumn("_in_exact", F.row_number().over(w) == 1)

    s1 = b1.where("_in_exact").select("doc_id", "text")
    pairs = TX.minhash_lsh_near_dup_pairs(s1).where(F.col("jaccard") >= 0.5)
    losers = (
        TX.connected_components_min_label(pairs)
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"), F.lit(1).alias("_loser"))
    )
    b2 = (
        b1.join(losers, "doc_id", "left")
        .withColumn("_in_nd", F.col("_in_exact") & F.col("_loser").isNull())
        .withColumn(
            "_in_q",
            F.col("_in_nd")
            & (TX.quality_score_col("text", _SW) >= _Q_THRESHOLD),
        )
    )

    bench = (
        TX.explode_no_refilter(
            docs.where(F.col("source") == _BENCH_SOURCE)
            .select(TX.word_shingles_col("text", 3).alias("s")),
            "s",
            "g",
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = TX.explode_no_refilter(
        b2.where(F.col("_in_q") & (F.col("source") != _BENCH_SOURCE)).select(
            "doc_id", TX.word_shingles_col("text", 3).alias("s")
        ),
        "s",
        "g",
    )
    contam = (
        tr.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg((F.count("_hit") / F.count(F.lit(1))).alias("_c"))
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(_SAMPLE_DEN),
    )
    b3 = (
        b2.join(contam, "doc_id", "left")
        .withColumn(
            "_in_dc",
            F.col("_in_q")
            & (F.col("source") != _BENCH_SOURCE)
            & (F.coalesce("_c", F.lit(0.0)) < _CONTAM_THRESHOLD),
        )
        .withColumn("_in_s", F.col("_in_dc") & (bucket < _SAMPLE_NUM))
    )

    def _d(flag: str) -> F.Column:
        return F.count(F.when(F.col(flag), 1))

    def _t(flag: str) -> F.Column:
        return F.sum(F.when(F.col(flag), F.col("_nt"))).cast("long")

    row = b3.agg(
        F.count(F.lit(1)).alias("d0"),
        F.sum("_nt").cast("long").alias("t0"),
        _d("_in_exact").alias("d1"),
        _t("_in_exact").alias("t1"),
        _d("_in_nd").alias("d2"),
        _t("_in_nd").alias("t2"),
        _d("_in_q").alias("d3"),
        _t("_in_q").alias("t3"),
        _d("_in_dc").alias("d4"),
        _t("_in_dc").alias("t4"),
        _d("_in_s").alias("d5"),
        _t("_in_s").alias("t5"),
    )
    return (
        row.select(
            F.expr(
                "stack(6,"
                " 0, 'raw',            d0, t0,"
                " 1, 'exact_dedup',    d1, t1,"
                " 2, 'near_dedup',     d2, t2,"
                " 3, 'quality',        d3, t3,"
                " 4, 'decontaminated', d4, t4,"
                " 5, 'sampled',        d5, t5"
                ") AS (stage_ord, stage, n_docs, n_tokens)"
            ),
            F.col("d0"),
        )
        .withColumn(
            "retained_frac",
            F.round(F.col("n_docs") / F.col("d0"), ROUND_DIGITS),
        )
        .drop("d0")
        .orderBy("stage_ord")
    )


format_doc(corpus_curation_e2e, bench=_BENCH_SOURCE, thr=_CONTAM_THRESHOLD, den=_SAMPLE_DEN)


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


# --- DSIR-style data selection ---------------------------------------------
_DSIR_B = 1024  # hashed bigram feature buckets
_DSIR_TARGET = ("src1", "src2", "src3")  # the target-domain slice
_DSIR_K = 50  # raw documents to select
_DSIR_LR_R = 8  # round the per-bucket log-ratio table (FP pinning)
_DSIR_W_R = 6  # round per-doc sums / scores
_DSIR_TARGET_SQL = ", ".join(f"'{s}'" for s in _DSIR_TARGET)


@query(
    "dsir_importance_select",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS t FROM documents
    ),
    bk AS (
      SELECT doc_id, source,
        CAST(('0x' || substr(md5(t[i] || ' ' || t[i + 1]), 1, 8)) AS BIGINT)
          % {_DSIR_B} AS b
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    cnt AS (
      SELECT b,
        sum(CASE WHEN source IN ({_DSIR_TARGET_SQL})
            THEN 1 ELSE 0 END)::BIGINT AS ct,
        sum(CASE WHEN source NOT IN ({_DSIR_TARGET_SQL})
            THEN 1 ELSE 0 END)::BIGINT AS cr
      FROM bk GROUP BY b
    ),
    tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM cnt),
    ratio AS (
      SELECT b,
        round(ln((ct + 1.0) / (nt + {_DSIR_B}))
              - ln((cr + 1.0) / (nr + {_DSIR_B})), {_DSIR_LR_R}) AS lr
      FROM cnt, tot
    ),
    docw AS (
      SELECT bk.doc_id, any_value(bk.source) AS source,
             round(sum(lr), {_DSIR_W_R}) AS log_w
      FROM bk JOIN ratio USING (b)
      WHERE bk.source NOT IN ({_DSIR_TARGET_SQL})
      GROUP BY bk.doc_id
    ),
    scored AS (
      SELECT doc_id, source, log_w,
        round(log_w + -ln(-ln(
          (CAST(('0x' || substr(md5('dsir:' || doc_id::VARCHAR), 1, 8))
                AS BIGINT) + 0.5) / 4294967296.0)), {_DSIR_W_R}) AS score
      FROM docw
    )
    SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
           doc_id, source, log_w, score
    FROM scored ORDER BY score DESC, doc_id LIMIT {_DSIR_K}
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-STYLE DATA SELECTION (Xie et al. 2023, arXiv:2302.03169):
    pick the raw-pool documents whose hashed-n-gram distribution looks
    most like a target domain, by importance resampling —

    1. every word bigram hashes into one of B=1024 feature buckets
       (md5, the engine's cross-engine hash convention), so the feature
       space is BOUNDED regardless of corpus vocabulary — the property
       that makes this a 100 TB-shaped selector (two B-row aggregates,
       never a vocab-sized shuffle);
    2. per bucket, add-one-smoothed log( p_target / p_raw ) — a 1024-row
       broadcast table (rounded at 1e-8 so JVM-vs-C ln ulps can't move
       a doc sum);
    3. each raw doc's importance log-weight is the sum of its bigram
       occurrences' log-ratios (one corpus-sized join against the
       broadcast table + one doc-keyed reduce);
    4. GUMBEL-TOP-K resampling: score = log_w + Gumbel(0,1) drawn from
       an md5-derived uniform per doc (RNG-free — the sample_by_hash
       convention), top 50 by (score, doc_id). Equivalent to
       sampling without replacement proportionally to softmax(log_w) —
       the distributional selection the DSIR paper uses rather than a
       deterministic top-k cut.

    Target domain = sources src1/src2/src3; the pool is every other
    source. Pure JVM column expressions end-to-end; hash-matched
    against the identical derivation in SQL."""
    from pyspark.sql.window import Window

    from .queries_text import _scan_partitions_estimate

    docs = load_table(spark, sf_dir, "documents")
    # Metadata scan-width estimate, not an RDD plan-compile (round 9;
    # same fix as queries_text._docs).
    est = _scan_partitions_estimate(spark, sf_dir, "documents")
    if est < spark.sparkContext.defaultParallelism:
        docs = TX.repartition_for_cpu(docs, "doc_id")
    toks = docs.select("doc_id", "source", TX.tokens_col("text").alias("t"))
    # GUARD <2-token docs: sequence(1, 0) yields a DESCENDING [1, 0] and
    # element_at(t, 0) raises at runtime, while the oracle's
    # generate_series(1, 0) is simply empty — filter to match (same
    # pattern as the BPE operator's `size('seg') >= 2` guard).
    toks = toks.where(F.size("t") >= 2)
    bigrams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("g"),
    )
    bk = bigrams.select(
        "doc_id",
        "source",
        F.pmod(
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long"),
            F.lit(_DSIR_B),
        ).alias("b"),
    )
    is_target = F.col("source").isin(*_DSIR_TARGET)
    cnt = bk.groupBy("b").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~is_target, 1).otherwise(0)).alias("cr"),
    )
    tot = cnt.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    ratio = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log((F.col("ct") + 1.0) / (F.col("nt") + _DSIR_B))
            - F.log((F.col("cr") + 1.0) / (F.col("nr") + _DSIR_B)),
            _DSIR_LR_R,
        ).alias("lr"),
    )
    docw = (
        bk.where(~is_target)
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.round(F.sum("lr"), _DSIR_W_R).alias("log_w"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / F.lit(4294967296.0)
    scored = docw.select(
        "doc_id",
        "source",
        "log_w",
        F.round(F.col("log_w") + -F.log(-F.log(u)), _DSIR_W_R).alias("score"),
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _DSIR_K)
        .select("rank", "doc_id", "source", "log_w", "score")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Exact substring-span dedup (round 7): the character-level dedup of
# Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better" (arXiv:2107.06499), re-expressed for a shuffle engine. The
# paper builds a suffix array to find every repeated substring >= 50
# chars; a suffix array is a single-machine structure, so the
# distributed standard is the strided fixed-width span fingerprint:
# every W-char window at stride S is hashed, and a window value seen in
# two DIFFERENT documents marks a cross-document repeated span. Any
# repeat of length >= W + S - 1 is guaranteed to contain at least one
# full grid-aligned window in both copies, so recall is complete for
# spans of that length (shorter repeats down to W are caught when the
# grids happen to align — the documented stride tradeoff).
# ---------------------------------------------------------------------------

_SPAN_W = 60  # span width (chars) — the paper's 50, rounded to grid
_SPAN_S = 15  # stride: recall-complete for repeats >= W + S - 1 = 74


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH spans AS (
      SELECT doc_id, source, substr(text, {_SPAN_S} * i + 1, {_SPAN_W}) AS sp
      FROM documents,
           LATERAL (SELECT unnest(generate_series(
                      0, (length(text) - {_SPAN_W}) // {_SPAN_S})) AS i)
      WHERE length(text) >= {_SPAN_W}
    ),
    dupval AS (
      SELECT sp FROM spans GROUP BY sp
      HAVING count(DISTINCT doc_id) >= 2
    ),
    flagged AS (
      SELECT s.doc_id, s.source,
             count(*) AS n_spans,
             count(d.sp) AS n_dup_spans
      FROM spans s LEFT JOIN dupval d ON d.sp = s.sp
      GROUP BY s.doc_id, s.source
    )
    SELECT source,
           SUM(n_spans)::BIGINT AS n_spans,
           SUM(n_dup_spans)::BIGINT AS n_dup_spans,
           COUNT(*) FILTER (n_dup_spans > 0)::BIGINT AS n_docs_affected,
           ROUND(SUM(n_dup_spans) * 1.0 / SUM(n_spans), {ROUND_DIGITS})
             AS dup_frac
    FROM flagged
    GROUP BY source
    ORDER BY source
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring detection (Lee et al. 2022
    shape): strided {_SPAN_W}-char window fingerprints; a window value
    occurring in >= 2 distinct documents marks a repeated span; rollup
    per source of span counts, duplicated-span mass, and affected docs.

    Scale shape: the span explode is a JVM sequence+substring projection
    (corpus_chars/{_SPAN_S} rows, no Python); the duplicate test is ONE
    shuffle keyed by the span value (partial aggregation collapses
    same-partition repeats map-side); the doc-level rollup joins the
    tiny duplicated-value set back by hash join. Nothing is quadratic:
    shuffle volume tracks total text volume, exactly like the MinHash
    banding — this is the exact-substring complement to those
    similarity-level passes, catching verbatim boilerplate/licenses/
    templates that near-dup banding treats as distinct documents."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    spans = (
        docs.where(F.length("text") >= _SPAN_W)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.length("text") - _SPAN_W) / _SPAN_S).cast(
                        "int"
                    ),
                )
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            "source",
            F.substring(
                F.col("text"), F.col("i") * _SPAN_S + 1, _SPAN_W
            ).alias("sp"),
        )
    )
    dupval = (
        spans.groupBy("sp")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("sp")
    )
    flagged = (
        spans.join(dupval.withColumn("_dup", F.lit(1)), "sp", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count("_dup").alias("n_dup_spans"),
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_dup_spans").alias("n_dup_spans"),
            F.sum(F.when(F.col("n_dup_spans") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_affected"),
            F.round(
                F.sum("n_dup_spans") / F.sum("n_spans"), ROUND_DIGITS
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


# Render the constants into the docstring (ADVICE r6 convention).
format_doc(dedup_substring_spans, _SPAN_W=_SPAN_W, _SPAN_S=_SPAN_S)


# ---------------------------------------------------------------------------
# Chunk-level cross-document dedup (round 7): pretraining/RAG pipelines
# chunk documents into token windows BEFORE embedding or packing, and
# dedup at CHUNK granularity — a chunk repeated across documents (shared
# boilerplate, quoted passages) is dropped once, even though neither
# containing document is a duplicate. Composes the doc_chunk_sliding
# fan-out with the dedup_exact fingerprint survivor rule at the finer
# granularity.
# ---------------------------------------------------------------------------

_CHUNK_TOKS = 32
_CHUNK_STRIDE = 16


@query(
    "chunk_dedup_cross_doc",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, source,
             array_to_string(
               list_slice(t, {_CHUNK_STRIDE} * i + 1,
                          {_CHUNK_STRIDE} * i + {_CHUNK_TOKS}), ' ')
               AS chunk
      FROM toks,
           LATERAL (SELECT unnest(generate_series(
                      0, greatest(len(t) - {_CHUNK_TOKS}, 0)
                         // {_CHUNK_STRIDE})) AS i)
      WHERE len(t) >= {_CHUNK_TOKS}
    ),
    per_chunk AS (
      SELECT chunk,
             count(*) AS n_copies,
             count(DISTINCT doc_id) AS n_docs,
             min(doc_id) AS survivor_doc
      FROM chunks GROUP BY chunk
    )
    SELECT source,
           count(*)::BIGINT AS n_chunk_instances,
           count(*) FILTER (pc.n_docs >= 2)::BIGINT AS n_cross_doc_dups,
           count(*) FILTER (pc.n_docs >= 2
                            AND c.doc_id <> pc.survivor_doc)::BIGINT
             AS n_dropped,
           SUM(length(c.chunk))
             FILTER (pc.n_docs >= 2 AND c.doc_id <> pc.survivor_doc)
             ::BIGINT AS bytes_dropped
    FROM chunks c JOIN per_chunk pc ON pc.chunk = c.chunk
    GROUP BY source
    ORDER BY source
    """,
)
def chunk_dedup_cross_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity dedup: slide {_CHUNK_TOKS}-token windows at
    stride {_CHUNK_STRIDE} over every document, fingerprint each chunk,
    and apply the min-doc_id survivor rule to chunks that appear in
    >= 2 distinct documents; per-source rollup of instances, cross-doc
    duplicates, dropped copies, and bytes saved.

    Scale shape: tokenization and window slicing are in-row JVM array
    ops (split + slice — no Python, no per-token explode); the chunk
    fan-out is corpus_tokens/{_CHUNK_STRIDE} rows; ONE shuffle keyed by
    the chunk value computes copies/distinct-docs/survivor in a single
    aggregate, and the classification joins back by hash. min-doc_id
    survivorship makes the drop decision deterministic and idempotent —
    re-running over the deduped corpus drops nothing (the fixpoint
    property dedup_exact pins at document level, here at chunk level,
    where RAG/pretraining pipelines actually dedup)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.trim("text"), r"\s+").alias("t")
    )
    chunks = (
        docs.where(F.size("t") >= _CHUNK_TOKS)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(
                        (F.size("t") - _CHUNK_TOKS) / _CHUNK_STRIDE
                    ).cast("int"),
                )
            ).alias("i"),
            "t",
        )
        .select(
            "doc_id",
            "source",
            F.concat_ws(
                " ",
                F.slice(
                    F.col("t"),
                    F.col("i") * _CHUNK_STRIDE + 1,
                    _CHUNK_TOKS,
                ),
            ).alias("chunk"),
        )
    )
    per_chunk = chunks.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("survivor_doc"),
    )
    dup = F.col("n_docs") >= 2
    dropped = dup & (F.col("doc_id") != F.col("survivor_doc"))
    return (
        chunks.join(per_chunk, "chunk")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunk_instances"),
            F.sum(F.when(dup, 1).otherwise(0))
            .cast("long")
            .alias("n_cross_doc_dups"),
            F.sum(F.when(dropped, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.sum(F.when(dropped, F.length("chunk")))
            .cast("long")
            .alias("bytes_dropped"),
        )
        .orderBy("source")
    )


format_doc(chunk_dedup_cross_doc, _CHUNK_TOKS=_CHUNK_TOKS, _CHUNK_STRIDE=_CHUNK_STRIDE)
