"""Scale rehearsal ONE DECADE past the largest on-disk testdata.

The scaling study (tools/scaling.py) covers sf0.001→sf0.1. This tool
fabricates an "sf1-equivalent" events table — 10× sf0.1 — and times the
whole event/streaming-adjacent query suite across that extra 10× step,
so the linearity claims extend two decades beyond the driver's bench SF.

The upsample is deterministic and key-disjoint: each sf0.1 event row is
replicated REPS times entirely JVM-side (explode of a literal sequence),
with replica r remapped to a fresh user_id / event_id keyspace. That
grows KEY CARDINALITY 10× while preserving per-user density and the
time range — the same shape a bigger real deployment has (more users,
not denser users), which is exactly the axis event-query shuffles
partition on. Timestamps, types, values, and props are untouched.

The relational suite gets the same treatment on the OTHER growth axis:
lineitem+orders replicated 10× into disjoint ORDER keyspaces with the
dimension tables untouched — the fact tables grow, per-dimension-key
density grows, dims stay dim-sized (exactly how a warehouse grows).
The text suite gets a WORKLOAD-NEUTRAL 10× corpus: every replica's
tokens are prefixed with a replica tag (so shingles/fingerprints never
collide across replicas — naive replication would manufacture near-dup
clusters and quadratic pair blow-ups) and sources are suffixed per
replica (so each source keeps its original per-source shape). Pair
queries therefore see exactly 10× the original workload: 10 isolated
copies. The embeddings axis (round-5 addition) gets the same isolation
via per-replica SIGN MASKS: replica r's vectors are multiplied
element-wise by a deterministic ±1 pattern (replica 0 = identity).
Sign-flipping both sides of a dot product cancels (s²=1), so every
WITHIN-replica cosine — and therefore each replica's neighborhood
structure, LSH bucket geometry, and recall — is bit-identical to the
original, while CROSS-replica cosines decorrelate to ~N(0, 1/√dim)
noise: 10 isolated copies, no degenerate duplicate neighborhoods that
naive replication would manufacture. dedup_embedding_cosine stays
excluded (documented all-pairs quadratic oracle baseline), and the
co-occurrence graph queries are excluded (duplicated orders multiply
edge weights, not edges).

Usage: python tools/scale_rehearsal.py [--out PATH] [--dir DIR] [names...]
Exit 1 if any query's 10× growth ratio exceeds the supralinear flag.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01_DIR = "/root/testdata/sf0.1"
DEFAULT_DIR = "/tmp/sparkgraft_sf1"
REPS = 10
SUPRALINEAR_RATIO = 12.0  # 10× data + noise headroom (matches scaling.py)

# Every registry query whose only input is the events table.
EVENT_QUERIES = [
    "event_window_tumbling",
    "event_window_sliding",
    "event_date_trunc_rollup",
    "event_props_json",
    "event_props_variant",
    "event_sessionization",
    "event_session_concurrency",
    "event_dedup_latest",
    "event_ffill_gap_fill",
    "event_rolling_1h_user_sum",
    "event_asof_last_purchase",
    "event_asof_next_purchase_1h",
    "event_range_join_clicks_before_purchase",
    "event_funnel_conversion",
    "event_transition_matrix",
    "user_event_type_profile",
    "sketch_rollup_daily_users",
    "cogroup_click_attribution",
    "ts_user_similarity_corr",
    "event_retention_cohorts",
    "user_rfm_segments",
    "event_daily_anomalies",
    "event_ab_test",
    "event_ts_autocorrelation",
    "event_weekday_seasonality",
    "basket_pair_lift",
    "event_time_to_convert",
    "event_cusum_changepoint",
    "event_ewma_daily",
    "event_path_trigrams",
    "event_seasonal_decompose",
    "event_session_window_builtin",
    # replicated users add identical transition mass, so the normalized
    # matrix (and the stationary pi) is invariant — the rehearsal still
    # measures the corpus-sized lead-window pass, which is the cost
    "event_markov_stationary",
    "event_welch_ttest_value",
    # round-6: per-user string collapse + regex, and the recursive-CTE
    # frontier walk (both linear in events; depth capped at 20)
    "event_pattern_regex_funnels",
    "sql_recursive_cte_balance",
]

# The cheapest PROPS-FREE event queries (the synthetic generator serves
# event_id/ts/user_id/event_type/value; props is NULL-padded), spot-
# checked at a third decade (1e6 → 1e7 rows) through the storage-free
# Python DataSource. Kept cheap on purpose: at 1e7 rows the Python-side
# generation is the linear floor and expensive queries would mostly
# re-measure it.
SF10_EVENT_QUERIES = [
    "event_window_tumbling",
    "event_date_trunc_rollup",
    "event_dedup_latest",
    "event_weekday_seasonality",
    "user_event_type_profile",
]

# Third decade for the 100-TB flagship operators (round-6, r5 verdict
# ask #3): the synthetic documents/embeddings DataSources serve 10×-
# and 100×-bench-SF corpora storage-free, replica-isolated exactly like
# the on-disk fabrication (token tags / orthant offsets — see
# sources/pyds.py), with planted near-dups so pair queries verify real
# candidates at every scale. Both sides of each ratio come from the
# SAME generator — self-consistent, no parquet/synthetic comparison.
SF10_TEXT_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_prefix",
]
SF10_EMBEDDING_QUERIES = [
    "knn_ann_hyperplane_lsh",
    "knn_ann_ivf",
    "knn_ann_ivf_pq",
]
_SF10_DOC_BASE = 5000  # sf0.1 corpus shape per replica
_SF10_EMB_BASE = 2000

# Relational queries over lineitem/orders + dims. Excluded by design:
# graph_* (order replication multiplies co-occurrence WEIGHTS, not the
# edge set — a different workload, not the same one at 10×).
RELATIONAL_QUERIES = [
    "flagship_top_customer_per_nation",
    "pricing_summary",
    "count_enrich_window",
    "topk_suppliers_per_nation",
    "left_join_enrich",
    "semi_join_big_spenders",
    "anti_join_no_urgent",
    "group_count_priority",
    "global_multi_agg",
    "window_analytics",
    "sort_limit_topn",
    "stats_percentiles_by_flag",
    "exact_mode_quantity",
    "heavy_hitters_suppkey",
    "histogram_price_bins",
    "histogram_equidepth_price",
    "stats_mad_outliers",
    "winsorize_extendedprice",
    "zorder_bucket_profile",
    "skew_profile_orders_custkey",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume_customers",
    "stats_gini_customer_revenue",
    "stats_ks_two_sample",
    "stats_chi_square_independence",
    "stats_benford_leading_digit",
    "stats_bootstrap_ci_mean",
    "join_runtime_bloom_pruned",
    "sql_group_by_all_revenue",
    # round-6 additions
    "tpch_q12_returnflag_priority",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity",
    "layout_bucketed_join_colocated",
    "layout_partition_pruned_daily",
    "source_orc_roundtrip_rollup",
    "fuzzy_join_fastss_d1",
    "dq_k_anonymity_profile",
    "stats_corr_matrix",
    "stats_trend_forecast_by_nation",
    # round-7 additions: the partsupp-backed TPC-H five (derived-table
    # joins; partsupp cardinality tracks part x 4 + observed lineitem pairs)
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q20_potential_part_promotion",
    # blocked Fellegi-Sunter linkage (customer x derived dirty twin;
    # pair volume tracks block sizes — the axis that grows with SF)
    "linkage_fellegi_sunter",
    # SQL-scripting surface: one scalar SET + a literal-planned query
    "sql_session_variables_param_query",
]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Text/dedup/curation queries over documents only. Excluded by design:
# dedup_embedding_cosine (quadratic baseline), knn_* (embeddings not
# fabricated), near_dup_clusters / dedup_survivors cousins are covered
# via their pair-producing cores below.
TEXT_QUERIES = [
    # round-7 additions: strided substring-span dedup and chunk-level
    # cross-doc dedup (both one-shuffle-on-fingerprint shapes)
    "dedup_substring_spans",
    "chunk_dedup_cross_doc",
    "sketch_approx_top_k_tokens",
    # documents-shaped source round-trips (fixture rebuilt per decade —
    # the write is part of the measured construction, like the layouts)
    "source_csv_glob_sentinel_repair",
    "source_jsonl_roundtrip_rollup",
    "text_features",
    "text_lang_id",
    "text_stats_by_source",
    "quality_filter_stats",
    "quality_repetition_gopher",
    "quality_unigram_surprisal",
    "boilerplate_ngrams_by_source",
    "vocab_top_tokens",
    "text_tfidf_top_terms",
    "dedup_exact",
    "dedup_survivors",
    "minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "dedup_ngram_jaccard_prefix",
    "dedup_containment",
    "decontaminate_ngram_overlap",
    "text_pii_redact",
    "doc_chunk_sliding",
    "pack_sequences_contiguous",
    "sample_by_hash_quarter",
    "sample_stratified_by_source",
    "sample_weighted_no_replacement",
    "sample_mixture_temperature",
    "split_leakage_check",
    "corpus_curation_e2e",
    "text_entropy_kl_by_source",
    "heavy_hitters_mg_tokens",
    "bpe_merge1_gate",
    "text_length_quantile_normalize",
    "dsir_importance_select",
    "text_bm25_topk",
    "dedup_incremental_new_vs_corpus",
    "quality_blocklist_filter",
    "text_ngram_novelty_score",
    "vocab_coverage_curve",
    # bpe_apply_compression is EXCLUDED by design: its greedy fold costs
    # O(word_len^2) array copies PER WORD (documented in bpe_segment_col)
    # and the fabricated corpus lengthens every token with a replica tag,
    # so the rehearsal would measure (len+tag)^2/len^2 fabrication bias
    # (~x1.9) on top of the byte inflation — at real scale the corpus
    # grows in WORD COUNT, not word length, and the op is linear in it.
]

# Embedding-table queries (round-5): every non-quadratic consumer of the
# embeddings table. The ANN trio is the family whose 100-TB behavior
# matters most — previously its scale claims rested on code-reading
# alone. knn_exact_cosine / sim_maxsim_multivector are O(Q·N) with the
# fixed 5-query demo set, i.e. linear in N here — included as honest
# baselines. knn_ann_recall_gate re-checks the LSH/IVF/IVF-PQ recall
# floors ON the fabricated corpus (within-replica geometry is exact, see
# module docstring, so the floors must hold at 10× too).
# dedup_embedding_cosine is excluded: documented all-pairs quadratic
# oracle baseline.
EMBEDDING_QUERIES = [
    "embedding_norms",
    "label_centroid_norms",
    "knn_exact_cosine",
    "knn_ann_hyperplane_lsh",
    "knn_ann_ivf",
    "knn_ann_ivf_pq",
    "knn_ann_recall_gate",
    "mapinarrow_embedding_quantize",
    "sim_maxsim_multivector",
    # round-6: cluster-local semantic dedup — the sub-quadratic scale
    # route whose candidate volume (~soft²/cells of all pairs) shrinks
    # as √N cells grow; the 10× ratio is the evidence for that claim
    "dedup_embedding_semdedup",
    # round-6: prefix-truncation recall — three broadcast corpus passes,
    # linear in N like knn_exact_cosine
    "knn_matryoshka_dim_recall",
    "knn_hard_negative_mining",
]

# The replica tag inflates BYTES beyond 10x (measured ~1.55x extra), but
# that only biases queries whose hot path does PER-CHARACTER work. This
# explicit subset gets the byte-adjusted flag threshold; token-level
# queries (shuffles/aggregates over token or doc rows — byte-neutral
# cost) keep the raw threshold, so a mildly supralinear token query can
# no longer hide inside the widened band (round-4 ADVICE). Every output
# row records BOTH verdicts (`supralinear` vs the applied threshold,
# `supralinear_raw` vs the unadjusted one) so the adjustment is
# auditable per query.
BYTE_SENSITIVE = {
    "text_features",            # char-class regex counts over full text
    "text_lang_id",             # char n-gram profile
    "text_pii_redact",          # regex scan+rewrite over full text
    "quality_filter_stats",     # punctuation/stopword char ratios
    "quality_repetition_gopher",  # char+word shingle strings
    "boilerplate_ngrams_by_source",  # shingle-string hashing
    "dedup_exact",              # md5 over full text
    "dedup_survivors",          # md5 over full text
    "minhash_signatures",       # shingle-string hashing
    "dedup_minhash_lsh_pairs",  # shingle-string hashing
    "simhash_signatures",       # shingle-string hashing
    "simhash_near_dup_pairs",   # shingle-string hashing
    "dedup_ngram_jaccard_prefix",  # tag-lengthened shingle strings
    "dedup_containment",        # tag-lengthened shingle strings
    "doc_chunk_sliding",        # substring extraction of chunk text
    "corpus_curation_e2e",      # fingerprint+minhash stages inside
    "text_entropy_kl_by_source",  # per-character distribution
    "bpe_merge1_gate",          # char-pair explode per distinct word
    "dsir_importance_select",   # per-occurrence bigram-string hashing
    "dedup_substring_spans",    # spans are CHAR windows: count and hash
    # volume both scale with bytes, not tokens
    "chunk_dedup_cross_doc",    # chunk strings lengthen with the tags
    "sketch_approx_top_k_tokens",  # per-token string hashing
    "text_bm25_topk",
    "dedup_incremental_new_vs_corpus",
    "quality_blocklist_filter",
    "text_ngram_novelty_score",
    "vocab_coverage_curve",     # token-frequency rollup
}


def _zipf_events_dir(spark, base_dir: str, rows_n: int) -> str:
    """Materialize Zipf(s=1.5)-keyed synthetic events to parquet once
    (shared by the skew decade and the 100× decade — the salted
    count-enrich must read a real columnar scan, not pay Python
    generation inside its timing)."""
    path = os.path.join(base_dir, f"events_zipf15_{rows_n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.perf_counter()
        (
            spark.read.format("synthetic_events")
            .option("rows", rows_n)
            .option("partitions", 64)
            .option("seed", 1)
            .option("users", rows_n * 15 // 1000)
            .option("zipf", 2)
            .load()
            .write.mode("overwrite")
            .parquet(path)
        )
        print(
            f"built zipf events ({rows_n} rows) in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    return path


def _write(df, out_dir: str) -> None:
    tmp = out_dir + ".tmp"
    df.repartition(32).write.mode("overwrite").parquet(tmp)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)


def build_sf1_events(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from big_data_imdb_classifier_spark.sources.readers import load_table

    ev = load_table(spark, SF01_DIR, "events")
    # stride by max+1, not count: ids need not be dense for disjointness
    n = ev.agg(F.max("event_id")).first()[0] + 1
    reps = F.explode(F.sequence(F.lit(0), F.lit(REPS - 1))).alias("_rep")
    up = (
        ev.select("*", reps)
        .select(
            (F.col("event_id") + F.col("_rep") * F.lit(n)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_rep") * F.lit(10_000_000)).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )
    )
    _write(up, out_dir)


_OKEY_STRIDE = 1_000_000_000  # disjoint order keyspaces per replica


def build_sf1_embeddings(spark, out_dir: str) -> None:
    """10× embeddings with per-replica DISJOINT NEIGHBORHOODS: replica
    r's vectors are sign-masked by a deterministic ±1 pattern (replica 0
    = identity, so the demo query vectors vec_id<5 keep their original
    geometry). Within a replica every cosine is bit-identical to the
    original corpus (the masks cancel: Σ s_i² u_i v_i = u·v); across
    replicas the random sign pattern decorrelates dots to noise — ten
    isolated copies, which is exactly 10× the honest ANN workload."""
    import numpy as np
    from pyspark.sql import functions as F

    from big_data_imdb_classifier_spark.sources.readers import load_table

    emb = load_table(spark, SF01_DIR, "embeddings")
    n = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.RandomState(7)
    masks = rng.choice([-1.0, 1.0], size=(REPS, dim))
    masks[0, :] = 1.0  # replica 0 is the untouched original
    masks_lit = F.array(
        *[
            F.array(*[F.lit(float(v)).cast("float") for v in masks[r]])
            for r in range(REPS)
        ]
    )
    reps = F.explode(F.sequence(F.lit(0), F.lit(REPS - 1))).alias("_rep")
    up = (
        emb.select("*", reps)
        .select(
            (F.col("vec_id") + F.col("_rep") * F.lit(n)).alias("vec_id"),
            F.zip_with(
                F.col("embedding"),
                F.element_at(masks_lit, F.col("_rep") + 1),
                lambda x, m: (x * m).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    _write(up, out_dir)


def build_sf1_docs(spark, out_dir: str) -> None:
    """10× documents, workload-neutral: replica-tagged tokens (no
    cross-replica shingle/fingerprint collisions) and replica-suffixed
    sources (per-source shape preserved). n_chars recomputed so
    length-derived stats stay consistent with the text."""
    from pyspark.sql import functions as F

    from big_data_imdb_classifier_spark.sources.readers import load_table

    docs = load_table(spark, SF01_DIR, "documents")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = F.explode(F.sequence(F.lit(0), F.lit(REPS - 1))).alias("_rep")
    tag = F.concat(F.lit("r"), F.col("_rep").cast("string"), F.lit("_"))
    up = (
        docs.select("*", reps)
        .select(
            (F.col("doc_id") + F.col("_rep") * F.lit(n)).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda t: F.concat(tag, t),
                ),
            ).alias("text"),
            "lang",
            F.concat(
                F.col("source"), F.lit("_r"), F.col("_rep").cast("string")
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    _write(up, out_dir)


def build_sf1_facts(spark, orders_dir: str, lineitem_dir: str) -> None:
    """10× lineitem+orders with replica-remapped ORDER keys; every other
    key (cust/supp/part) untouched, so dimension joins see 10× the fact
    rows per dim key — the fact-growth axis."""
    from pyspark.sql import functions as F

    from big_data_imdb_classifier_spark.sources.readers import load_table

    reps = F.explode(F.sequence(F.lit(0), F.lit(REPS - 1))).alias("_rep")
    orders = load_table(spark, SF01_DIR, "orders")
    _write(
        orders.select("*", reps)
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("_rep") * _OKEY_STRIDE
        )
        .drop("_rep"),
        orders_dir,
    )
    li = load_table(spark, SF01_DIR, "lineitem")
    _write(
        li.select("*", reps)
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("_rep") * _OKEY_STRIDE
        )
        .drop("_rep"),
        lineitem_dir,
    )


def main() -> None:
    from big_data_imdb_classifier_spark import plans
    from big_data_imdb_classifier_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="scale-rehearsal")

    def _flag_value(flag: str) -> str | None:
        if flag not in sys.argv:
            return None
        i = sys.argv.index(flag) + 1
        if i >= len(sys.argv):
            raise SystemExit(f"{flag} requires a value")
        return sys.argv[i]

    base_dir = _flag_value("--dir") or DEFAULT_DIR
    args, skip = sys.argv[1:], False
    names = []
    for a in args:
        if skip:
            skip = False
        elif a in ("--out", "--dir"):
            skip = True
        elif not a.startswith("--"):
            names.append(a)
    only_named = bool(names)
    names = [
        n
        for n in (
            names
            or EVENT_QUERIES
            + RELATIONAL_QUERIES
            + TEXT_QUERIES
            + EMBEDDING_QUERIES
        )
        if n in plans.QUERIES
    ]

    fabricated = {
        "events": (os.path.join(base_dir, "events_sf1"), None),
        "orders": (os.path.join(base_dir, "orders_sf1"), None),
        "lineitem": (os.path.join(base_dir, "lineitem_sf1"), None),
        "documents": (os.path.join(base_dir, "documents_sf1"), None),
        "embeddings": (os.path.join(base_dir, "embeddings_sf1"), None),
    }
    if not os.path.exists(os.path.join(fabricated["events"][0], "_SUCCESS")):
        t0 = time.perf_counter()
        build_sf1_events(spark, fabricated["events"][0])
        print(
            f"built sf1 events ({REPS}x sf0.1) in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    if not os.path.exists(os.path.join(fabricated["documents"][0], "_SUCCESS")):
        t0 = time.perf_counter()
        build_sf1_docs(spark, fabricated["documents"][0])
        print(
            f"built sf1 documents ({REPS}x sf0.1) in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    if not os.path.exists(os.path.join(fabricated["lineitem"][0], "_SUCCESS")):
        t0 = time.perf_counter()
        build_sf1_facts(
            spark, fabricated["orders"][0], fabricated["lineitem"][0]
        )
        print(
            f"built sf1 orders+lineitem ({REPS}x sf0.1) in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    if not os.path.exists(
        os.path.join(fabricated["embeddings"][0], "_SUCCESS")
    ):
        t0 = time.perf_counter()
        build_sf1_embeddings(spark, fabricated["embeddings"][0])
        print(
            f"built sf1 embeddings ({REPS}x sf0.1, sign-masked replicas) "
            f"in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    # Queries take an sf_dir: fabricated tables point at the upsamples,
    # every other table symlinks the real sf0.1 parquet (dims stay dims).
    sf1_dir = os.path.join(base_dir, "as_sf_dir")
    os.makedirs(sf1_dir, exist_ok=True)
    for t in TABLES:
        link = os.path.join(sf1_dir, f"{t}.parquet")
        target = (
            fabricated[t][0]
            if t in fabricated
            else os.path.join(SF01_DIR, f"{t}.parquet")
        )
        # re-point stale links (a table may graduate from real to
        # fabricated between runs); lexists, not exists — a DANGLING
        # link (target cleaned from /tmp) must be replaced, not crash
        # os.symlink with FileExistsError
        if os.path.islink(link) and os.readlink(link) != target:
            os.remove(link)
        if not os.path.lexists(link):
            os.symlink(target, link)

    def run(name: str, sf_dir: str) -> float:
        # Construction + execution, same protocol as bench.py: build-time
        # driver-coordinated work (BPE argmax rounds, eager checkpoints)
        # must grow with the decade too, so it belongs inside the ratio.
        t0 = time.perf_counter()
        df = plans.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        # same cache isolation as bench.py: queries that persist
        # intermediates must not leave them resident for later timings
        spark.catalog.clearCache()
        return elapsed

    # Warm-up at sf0.01 (JIT/codegen), then time sf0.1 and sf1.
    for n in names:
        try:
            run(n, "/root/testdata/sf0.01")
        except Exception:
            pass

    # The fabricated text corpus is token-count-neutral but NOT byte-
    # neutral: replica tags lengthen every token, so char-level costs
    # honestly grow beyond x10 by construction. Scale the text suite's
    # flag threshold by the measured byte-growth factor.
    byte_factor = 1.0
    if any(n in TEXT_QUERIES for n in names):
        from pyspark.sql import functions as F

        from big_data_imdb_classifier_spark.sources.readers import load_table

        b01 = load_table(spark, SF01_DIR, "documents").agg(
            F.sum(F.length("text"))
        ).first()[0]
        b1 = load_table(spark, sf1_dir, "documents").agg(
            F.sum(F.length("text"))
        ).first()[0]
        byte_factor = round(b1 / (REPS * b01), 3)

    def threshold(name: str) -> float:
        if name in BYTE_SENSITIVE:
            return SUPRALINEAR_RATIO * byte_factor
        return SUPRALINEAR_RATIO

    rows = []
    for n in names:
        try:
            # Baseline = median of 3 (cheap at sf0.1, and a single lucky
            # fast run would otherwise inflate the ratio of a genuinely
            # linear query — a saturated-parallelism query's honest 10×
            # ratio is ~10-11, uncomfortably near the flag threshold).
            t_01 = round(sorted(run(n, SF01_DIR) for _ in range(3))[1], 3)
            t_1 = round(run(n, sf1_dir), 3)
            ratio = round(t_1 / max(t_01, 1e-9), 2)
            big_samples = [t_1]
            if ratio > threshold(n):
                # A single timed run mid-sweep can eat another query's
                # page-cache eviction (measured: event_props_json x19.5
                # in-sweep vs x0.8 isolated). Cold first-touch is an
                # environment property, not an algorithmic one — on a
                # tripped threshold, bring the big side up to the SAME
                # median-of-3 protocol the small side always gets, and
                # record every sample. (The pre-r9 form kept min(first,
                # one retry) against a median-of-3 small side — a
                # best-of-N on one side of the ratio biases growth
                # downward, so host noise could nudge a marginally
                # supralinear query under the flag; round-8 ADVICE.)
                big_samples += [round(run(n, sf1_dir), 3) for _ in range(2)]
                t_1 = sorted(big_samples)[1]
                ratio = round(t_1 / max(t_01, 1e-9), 2)
        except Exception as ex:  # noqa: BLE001
            print(f"rehearsal: {n} failed: {ex}", file=sys.stderr)
            continue
        rows.append(
            {
                "query": n,
                "sec": {"0.1": t_01, "1": t_1},
                "growth_10x": ratio,
                "threshold": round(threshold(n), 2),
                "supralinear": ratio > threshold(n),
                # raw verdict vs the UNADJUSTED threshold, recorded even
                # for byte-sensitive queries so the byte-factor
                # adjustment is auditable row by row
                "supralinear_raw": ratio > SUPRALINEAR_RATIO,
                **({"byte_adjusted": True} if n in BYTE_SENSITIVE else {}),
                **(
                    {"retried": True, "big_samples": big_samples}
                    if len(big_samples) > 1
                    else {}
                ),
            }
        )

    # THIRD DECADE (sf10-equivalent, storage-free): the synthetic Python
    # DataSource serves the events shape at any row count, so the
    # cheapest props-free event queries get one more 10× step — 1e6 vs
    # 1e7 rows (10× / 100× the bench SF's 1e5), both sides drawn from
    # the SAME deterministic generator (the ratio is self-consistent; no
    # parquet/synthetic cross-comparison). User cardinality scales with
    # rows to preserve the per-user density the sf0.1 parquet has
    # (1 500 users per 1e5 rows). Generation is Python-per-row and
    # linear, so it cannot mask a supralinear query — it only adds a
    # linear floor to both sides.
    sf10_rows = []
    # --sf10 forces the synthetic third-decade section for a NAMED run
    # (so one flagged query can be re-measured after a fix without the
    # full 185-query sweep); the named filter then applies inside.
    force_sf10 = "--sf10" in sys.argv
    if not only_named or force_sf10:
        def synth(rows_n: int) -> str:
            return (
                f"synthetic://?rows={rows_n}&seed=1"
                f"&users={rows_n * 15 // 1000}&partitions=64"
            )

        def synth_docs(docs_n: int) -> str:
            return (
                f"synthetic://?doc_rows={docs_n}&doc_base={_SF10_DOC_BASE}"
                "&seed=1&partitions=64"
            )

        def synth_emb(vecs_n: int) -> str:
            return (
                f"synthetic://?emb_rows={vecs_n}&emb_base={_SF10_EMB_BASE}"
                "&seed=1&partitions=64"
            )

        sf10_cases = (
            [(n, synth(1_000_000), synth(10_000_000))
             for n in SF10_EVENT_QUERIES]
            + [(n, synth_docs(50_000), synth_docs(500_000))
               for n in SF10_TEXT_QUERIES]
            + [(n, synth_emb(20_000), synth_emb(200_000))
               for n in SF10_EMBEDDING_QUERIES]
        )
        for n, small_uri, big_uri in sf10_cases:
            if n not in plans.QUERIES:
                continue
            if force_sf10 and only_named and n not in names:
                continue
            try:
                t_1 = round(
                    sorted(run(n, small_uri) for _ in range(3))[1], 3
                )
                t_10 = round(run(n, big_uri), 3)
                ratio = round(t_10 / max(t_1, 1e-9), 2)
                big_samples = [t_10]
                if ratio > SUPRALINEAR_RATIO:
                    # symmetric protocol on trip: median-of-3 both sides
                    # (round-8 ADVICE — min() on one side biases down)
                    big_samples += [
                        round(run(n, big_uri), 3) for _ in range(2)
                    ]
                    t_10 = sorted(big_samples)[1]
                    ratio = round(t_10 / max(t_1, 1e-9), 2)
            except Exception as ex:  # noqa: BLE001
                print(f"rehearsal sf10: {n} failed: {ex}", file=sys.stderr)
                continue
            sf10_rows.append(
                {
                    "query": n,
                    "sec": {"1": t_1, "10": t_10},
                    "growth_10x": ratio,
                    "supralinear": ratio > SUPRALINEAR_RATIO,
                    **(
                        {"retried": True, "big_samples": big_samples}
                        if len(big_samples) > 1
                        else {}
                    ),
                }
            )

    # SKEW DECADE (round 7, VERDICT r6 task 6): every corpus above is
    # UNIFORM-keyed, so the engine's skew-handling claims (salted
    # count-enrich, AQE skew-join) had never been proven on skewed DATA.
    # The events DataSource's zipf=2 option draws user keys Zipf(s=1.5)
    # (hot user ≈ 29% of ALL rows); two decades are
    # materialized to parquet once and three head-to-heads run on them:
    # the naive one-window count-enrich vs the salted two-phase variant
    # (hot key spread over 16 salt buckets), and a forced sort-merge
    # fact⋈dim join with AQE skew-split on vs off. Ratios across the
    # decade ride the same 0-supralinear gate as every other family.
    skew_rows = []
    force_skew = "--skew" in sys.argv
    if not only_named or force_skew:
        from pyspark.sql import functions as F

        from big_data_imdb_classifier_spark.operators.relational import (
            count_enrich,
            count_enrich_salted,
        )
        from big_data_imdb_classifier_spark.sources import pyds

        pyds.register(spark)
        _SKEW_SMALL, _SKEW_BIG = 1_000_000, 10_000_000

        def _zipf_dir(rows_n: int) -> str:
            return _zipf_events_dir(spark, base_dir, rows_n)

        def _t(build) -> float:
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            return round(time.perf_counter() - t0, 3)

        small, big = _zipf_dir(_SKEW_SMALL), _zipf_dir(_SKEW_BIG)
        ev = {p: spark.read.parquet(p) for p in (small, big)}
        # recorded hot-key mass so the artifact shows the skew is real
        hot = (
            ev[big].groupBy("user_id").count()
            .orderBy(F.desc("count")).first()
        )
        # Scale the session confs to the rehearsal's absolute size: at
        # 10M rows the hot key (~580k rows ≈ 25 MB) never crosses AQE's
        # production defaults (256 MB threshold, 5x-median factor) even
        # though it is a genuine 15x-median straggler once partitions
        # are sized the way a 100 TB job's would be (many partitions,
        # each a small fraction of the data). 256 shuffle partitions +
        # MB-scale skew thresholds reproduce at MB what a real corpus
        # crosses at GB; the on/off runs share every conf except
        # `enabled` itself.
        _skew_confs = {
            "spark.sql.shuffle.partitions": "256",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "4m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        }
        _prev_confs = {
            k: spark.conf.get(k, None) for k in _skew_confs
        }
        for k, v in _skew_confs.items():
            spark.conf.set(k, v)

        def _dim(p):
            # per-user dim, MATERIALIZED to parquet: deriving it inline
            # (distinct + project) leaves a HashAggregate between the
            # dim's exchange and its Sort, and OptimizeSkewedJoin's
            # pattern — a plain shuffle stage directly under each side's
            # Sort — then never matches, so the split silently never
            # fires (measured: identical on/off timings, 0 skew marks in
            # the final plan). A pre-materialized dim joins as two plain
            # scans and the split fires. At 100 TB the same rule applies:
            # feed skew-prone SMJs from materialized/rebalanced inputs,
            # not from plans with aggregates fused onto the build side.
            path = os.path.join(base_dir, f"zipf_dim_{os.path.basename(p)}")
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                (
                    ev[p].select("user_id").distinct()
                    .withColumn(
                        "segment", F.pmod(F.col("user_id"), F.lit(7))
                    )
                    .write.mode("overwrite").parquet(path)
                )
            return spark.read.parquet(path)

        def _skew_join(p, enabled: bool):
            def build():
                spark.conf.set(
                    "spark.sql.adaptive.skewJoin.enabled",
                    "true" if enabled else "false",
                )
                # merge hint: keep the sort-merge shape (the dim would
                # otherwise broadcast and hide the skewed shuffle)
                return (
                    ev[p].hint("merge")
                    .join(_dim(p).hint("merge"), "user_id")
                    .groupBy("segment")
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.sum("value").alias("v"))
                )

            return build

        skew_cases = {
            "skew_count_enrich_window_naive": lambda p: (
                lambda: count_enrich(ev[p], "user_id", "n_events")
            ),
            "skew_count_enrich_salted": lambda p: (
                lambda: count_enrich_salted(ev[p], "user_id", "n_events")
            ),
            "skew_smj_join_aqe_skew_on": lambda p: _skew_join(p, True),
            "skew_smj_join_aqe_skew_off": lambda p: _skew_join(p, False),
        }
        try:
            for name, mk in skew_cases.items():
                _t(mk(small))  # warm (JIT + page cache)
                t_s = round(sorted(_t(mk(small)) for _ in range(3))[1], 3)
                t_b = round(_t(mk(big)), 3)
                ratio = round(t_b / max(t_s, 1e-9), 2)
                big_samples = [t_b]
                if ratio > SUPRALINEAR_RATIO:
                    # symmetric protocol on trip: median-of-3 both sides
                    big_samples += [
                        round(_t(mk(big)), 3) for _ in range(2)
                    ]
                    t_b = sorted(big_samples)[1]
                    ratio = round(t_b / max(t_s, 1e-9), 2)
                skew_rows.append(
                    {
                        "query": name,
                        "sec": {"1m": t_s, "10m": t_b},
                        "growth_10x": ratio,
                        "supralinear": ratio > SUPRALINEAR_RATIO,
                        **(
                            {"retried": True, "big_samples": big_samples}
                            if len(big_samples) > 1
                            else {}
                        ),
                    }
                )
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            for k, v in _prev_confs.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        by_name = {r["query"]: r for r in skew_rows}
        skew_summary = {
            "hot_user_id": hot["user_id"],
            "hot_user_rows": hot["count"],
            "hot_user_frac_10m": round(hot["count"] / _SKEW_BIG, 4),
            "salted_vs_naive_10m": round(
                by_name["skew_count_enrich_salted"]["sec"]["10m"]
                / max(by_name["skew_count_enrich_window_naive"]["sec"]["10m"],
                      1e-9),
                3,
            ) if {"skew_count_enrich_salted",
                  "skew_count_enrich_window_naive"} <= by_name.keys() else None,
            "aqe_skew_on_vs_off_10m": round(
                by_name["skew_smj_join_aqe_skew_on"]["sec"]["10m"]
                / max(by_name["skew_smj_join_aqe_skew_off"]["sec"]["10m"],
                      1e-9),
                3,
            ) if {"skew_smj_join_aqe_skew_on",
                  "skew_smj_join_aqe_skew_off"} <= by_name.keys() else None,
        }
    else:
        skew_summary = None

    # 100× DECADE (round 8, VERDICT r7 task 7): every ratio above spans
    # ONE 10× step; a query that is mildly supralinear per decade can
    # hide inside the per-decade slack twice over. The synthetic
    # DataSources are storage-free, so a TWO-decade step (100× the bench
    # shape) costs only compute — one representative per family runs at
    # 100×: the directional incremental dedup over documents, the salted
    # count-enrich over Zipf(s=1.5) events (parquet-materialized, so the
    # timing is a columnar scan, not Python generation), and the IVF ANN
    # gate over embeddings. Linear across two decades = ×100; the flag
    # threshold applies the per-decade slack twice
    # ((SUPRALINEAR_RATIO/10)² · 100 = ×144), byte-scaled for the
    # byte-sensitive dedup exactly like the main decade. Opt-in via
    # --x100: one 5M-doc minhash pass is minutes of compute and doesn't
    # belong in every iteration loop.
    x100_rows = []
    if "--x100" in sys.argv:
        from pyspark.sql import functions as F

        from big_data_imdb_classifier_spark.operators.relational import (
            count_enrich_salted,
        )
        from big_data_imdb_classifier_spark.sources import pyds
        from big_data_imdb_classifier_spark.sources.readers import load_table

        pyds.register(spark)
        X100_RATIO = (SUPRALINEAR_RATIO / 10.0) ** 2 * 100.0

        def synth_docs_n(docs_n: int) -> str:
            return (
                f"synthetic://?doc_rows={docs_n}&doc_base={_SF10_DOC_BASE}"
                "&seed=1&partitions=64"
            )

        def synth_emb_n(vecs_n: int) -> str:
            return (
                f"synthetic://?emb_rows={vecs_n}&emb_base={_SF10_EMB_BASE}"
                "&seed=1&partitions=64"
            )

        # Byte factor across the two-decade doc corpus: replica tags
        # lengthen tokens ~logarithmically in the replica count, so the
        # 100× corpus carries MORE than 100× the bytes; char-level work
        # honestly grows with it (same adjustment as the main decade).
        def _doc_bytes(uri: str) -> int:
            return (
                load_table(spark, uri, "documents")
                .agg(F.sum(F.length("text")))
                .first()[0]
            )

        x100_doc_small, x100_doc_big = 50_000, 5_000_000
        doc_byte_factor_100 = round(
            _doc_bytes(synth_docs_n(x100_doc_big))
            / (100.0 * _doc_bytes(synth_docs_n(x100_doc_small))),
            3,
        )

        zip_small = _zipf_events_dir(spark, base_dir, 1_000_000)
        zip_big = _zipf_events_dir(spark, base_dir, 100_000_000)
        ev_s, ev_b = spark.read.parquet(zip_small), spark.read.parquet(zip_big)

        def _t100(build) -> float:
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            return round(time.perf_counter() - t0, 3)

        # Text trio at the 100× decade (round 9, VERDICT r8 task 6):
        # the banded-LSH pair dedup, the prefix-filtered exact-Jaccard
        # dedup (whose vocabulary-sized broadcast→shuffle join switch
        # had only ever fired at 10×), and the composed curation
        # funnel. Corpora are MATERIALIZED to parquet once (same
        # precedent as the Zipf events): the timing measures a columnar
        # scan, not per-row Python generation, which would add a large
        # linear floor to both sides and dilute any real growth signal.
        def _docs_dir_n(docs_n: int) -> str:
            path = os.path.join(base_dir, f"docs_x_{docs_n}")
            tbl = os.path.join(path, "documents.parquet")
            if not os.path.exists(os.path.join(tbl, "_SUCCESS")):
                t0 = time.perf_counter()
                (
                    load_table(spark, synth_docs_n(docs_n), "documents")
                    .repartition(64)
                    .write.mode("overwrite")
                    .parquet(tbl)
                )
                print(
                    f"materialized {docs_n}-doc corpus in "
                    f"{time.perf_counter() - t0:.1f}s",
                    file=sys.stderr,
                )
            return path

        trio_small = _docs_dir_n(x100_doc_small)
        trio_big = _docs_dir_n(x100_doc_big)
        trio_bf = round(
            _doc_bytes(trio_big) / (100.0 * _doc_bytes(trio_small)), 3
        )

        def _jaccard_join_shape(sf_dir: str) -> dict:
            """Join-node census of the jaccard PREFIX INDEX plan — the
            in-plan evidence that the corpus-scaled dfreq join switch
            fired: below the vocabulary bound the doc-frequency join is
            a BroadcastHashJoin; above it, a shuffle join on the
            shingle key. Probed on the pre-checkpoint index
            (queries_text.jaccard_prefix_index): the full query
            localCheckpoints it, after which the join is invisible in
            the query's own plan (it shows only the checkpointed RDD
            scan)."""
            from big_data_imdb_classifier_spark.plans.queries_text import (
                jaccard_prefix_index,
            )

            _sh, idx = jaccard_prefix_index(spark, sf_dir)
            p = idx._jdf.queryExecution().executedPlan().toString()
            return {
                k: p.count(k)
                for k in (
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                )
            }

        x100_extra_fields = {
            "dedup_ngram_jaccard_prefix": {
                "plan_small": _jaccard_join_shape(trio_small),
                "plan_big": _jaccard_join_shape(trio_big),
            }
        }

        x100_cases = [
            (
                "dedup_incremental_new_vs_corpus",
                lambda: run(
                    "dedup_incremental_new_vs_corpus",
                    synth_docs_n(x100_doc_small),
                ),
                lambda: run(
                    "dedup_incremental_new_vs_corpus",
                    synth_docs_n(x100_doc_big),
                ),
                doc_byte_factor_100,
            ),
        ] + [
            (
                q,
                lambda q=q: run(q, trio_small),
                lambda q=q: run(q, trio_big),
                trio_bf,
            )
            for q in (
                "dedup_minhash_lsh_pairs",
                "dedup_ngram_jaccard_prefix",
                "corpus_curation_e2e",
            )
        ] + [
            (
                "x100_count_enrich_salted_zipf",
                lambda: _t100(
                    lambda: count_enrich_salted(ev_s, "user_id", "n_events")
                ),
                lambda: _t100(
                    lambda: count_enrich_salted(ev_b, "user_id", "n_events")
                ),
                1.0,
            ),
            (
                "knn_ann_ivf",
                lambda: run("knn_ann_ivf", synth_emb_n(20_000)),
                lambda: run("knn_ann_ivf", synth_emb_n(2_000_000)),
                1.0,
            ),
        ]
        for name, small_fn, big_fn, bf in x100_cases:
            try:
                small_fn()  # warm (JIT + codegen)
                t_s = round(sorted(small_fn() for _ in range(3))[1], 3)
                t_b = round(big_fn(), 3)
                ratio = round(t_b / max(t_s, 1e-9), 2)
                thr = round(X100_RATIO * bf, 2)
                big_samples = [t_b]
                if ratio > thr:
                    # symmetric protocol on trip (round-8 ADVICE): the
                    # big side joins the small side's median-of-3 — a
                    # min() retry on one side of the ratio is a
                    # best-of-N that can nudge a marginally supralinear
                    # query under the flag on host noise alone.
                    big_samples += [round(big_fn(), 3) for _ in range(2)]
                    t_b = sorted(big_samples)[1]
                    ratio = round(t_b / max(t_s, 1e-9), 2)
            except Exception as ex:  # noqa: BLE001
                print(f"rehearsal x100: {name} failed: {ex}", file=sys.stderr)
                continue
            x100_rows.append(
                {
                    "query": name,
                    "sec": {"1x": t_s, "100x": t_b},
                    "growth_100x": ratio,
                    # per-decade exponent the ratio implies:
                    # t ∝ N^e with N ×100 → e = log10(ratio)/2
                    "decade_exponent": round(
                        math.log10(max(ratio, 1e-9)) / 2.0, 3
                    ),
                    "threshold": thr,
                    "supralinear": ratio > thr,
                    "supralinear_raw": ratio > X100_RATIO,
                    **(
                        {"byte_adjusted": True, "byte_factor": bf}
                        if bf != 1.0
                        else {}
                    ),
                    **(
                        {"retried": True, "big_samples": big_samples}
                        if len(big_samples) > 1
                        else {}
                    ),
                    **x100_extra_fields.get(name, {}),
                }
            )

    out = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "reps": REPS,
        "text_byte_factor": byte_factor,
        "rows": rows,
        "sf10_synthetic_rows": sf10_rows,
        "skew_rows": skew_rows,
        "skew_summary": skew_summary,
        "x100_rows": x100_rows,
    }
    out_path = _flag_value("--out")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    for r in rows:
        flag = "  <-- SUPRALINEAR" if r["supralinear"] else ""
        print(
            f"{r['sec']['0.1']:7.2f} {r['sec']['1']:7.2f} "
            f"x{r['growth_10x']:<5} {r['query']}{flag}"
        )
    for r in sf10_rows:
        flag = "  <-- SUPRALINEAR" if r["supralinear"] else ""
        print(
            f"{r['sec']['1']:7.2f} {r['sec']['10']:7.2f} "
            f"x{r['growth_10x']:<5} {r['query']} [sf10 synthetic]{flag}"
        )
    for r in skew_rows:
        flag = "  <-- SUPRALINEAR" if r["supralinear"] else ""
        print(
            f"{r['sec']['1m']:7.2f} {r['sec']['10m']:7.2f} "
            f"x{r['growth_10x']:<5} {r['query']} [zipf skew]{flag}"
        )
    if skew_summary:
        print("skew summary:", json.dumps(skew_summary))
    for r in x100_rows:
        flag = "  <-- SUPRALINEAR" if r["supralinear"] else ""
        print(
            f"{r['sec']['1x']:7.2f} {r['sec']['100x']:7.2f} "
            f"x{r['growth_100x']:<6} {r['query']} [x100]{flag}"
        )
    # Every family — x100 included — rides the same exit gate (the
    # pre-r9 form left x100_rows out of n_bad, so a supralinear
    # two-decade row could not fail the run).
    n_bad = (
        sum(r["supralinear"] for r in rows)
        + sum(r["supralinear"] for r in sf10_rows)
        + sum(r["supralinear"] for r in skew_rows)
        + sum(r["supralinear"] for r in x100_rows)
    )
    print(
        json.dumps(
            {
                "total": len(rows) + len(sf10_rows) + len(skew_rows)
                + len(x100_rows),
                "supralinear": n_bad,
            }
        )
    )
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
