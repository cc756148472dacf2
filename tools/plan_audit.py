"""Physical-plan audit over the whole query registry.

Correctness artifacts (CORRECTNESS/SIM) prove the engine computes the
right answers; this tool writes the matching SCALE artifact: for every
registered query it compiles the sf0.1 plan (no execution) and records
the shape metrics that matter at 100 TB —

* shuffle exchanges / broadcast exchanges
* join strategies (sort-merge / broadcast-hash / shuffled-hash /
  nested-loop / cartesian)
* whole-stage-codegen span count (JVM-compiled pipeline breadth)
* Python boundaries (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
* scans with pushed filters and pruned read schemas

and FLAGS anti-patterns: any CartesianProduct or BroadcastNestedLoopJoin
outside the explicit whitelist (queries whose semantics are a bounded
cross product), and any row-at-a-time PythonUDF eval (BatchEvalPython —
the engine bans these; Arrow-batched is the floor).

Usage: python tools/plan_audit.py [--out PATH] [names...]
Exit 1 if any query is flagged, so it doubles as a CI gate.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.1")

# Queries whose logical semantics ARE a bounded cross product (scalar
# broadcast or an intentional small-dims cartesian): the only places a
# nested-loop/cartesian operator is acceptable.
CROSS_WHITELIST = {
    "cross_join_region_priority",   # intentional 5x5 dims cartesian
    "heavy_hitters_suppkey",        # scalar-threshold broadcast join
    "event_funnel_conversion",      # single-row stage-count crossJoins
    "sketch_rollup_daily_users",    # single-row sketch-union crossJoin
    "decontaminate_ngram_overlap",  # broadcast benchmark-shingle set
    "knn_exact_cosine",             # documented O(QxN) broadcast baseline
    "dq_profile_orders",            # single-row profile crossJoin
    # blocked-GEMM cosine: the block-pair grid (two tiny block-id lists,
    # BNLJ on b1 <= b2) is metadata-scale — B² int pairs, not row data;
    # the row-data path is the Arrow matmul over co-grouped blocks.
    "dedup_embedding_cosine",
    "graph_copurchase_pagerank",    # single-row node-count broadcast per iter
    "histogram_equidepth_price",    # single-row edge-vector broadcast + the
    # ≤18-row rank-probe broadcast range join of the distributed-exact
    # quantile machinery (BroadcastNestedLoop over a constant-size side)
    "quality_unigram_surprisal",    # single-row LM-total + 2-sigma-cut broadcasts
    "dsir_importance_select",       # single-row (n_target, n_raw) totals
    # crossJoin onto the 1024-row bucket table — constant-size both sides
    "user_rfm_segments",            # 1-row corpus-max + tercile-cut broadcasts
    # group_quantiles rank-probe: a |groups|×2·|pcts|-row broadcast range
    # join (BroadcastNestedLoop over a constant-size side) — the price of
    # distributed exact order statistics with no per-group value buffering
    "stats_percentiles_by_flag",
    "stats_mad_outliers",
    "winsorize_extendedprice",
    "event_daily_anomalies",        # single-row median/MAD scalar broadcasts
    "event_weekday_seasonality",    # single-row global-mean scalar broadcast
    "zorder_bucket_profile",        # single-row min/max-bounds scalar broadcast
    "basket_pair_lift",             # single-row user-total scalar broadcast
    "stats_ks_two_sample",          # single-row (n1, n2) sample-size broadcast
    "stats_chi_square_independence",  # marginal-grid crossJoins (R x C <= 15 rows)
    "stats_benford_leading_digit",  # single-row corpus-total scalar broadcast
    "event_cusum_changepoint",      # single-row baseline mu0/sigma0 broadcast
    "text_entropy_kl_by_source",    # single-row grand-total scalar broadcast
    "heavy_hitters_mg_tokens",      # single-row corpus-total scalar broadcast
    "sim_maxsim_multivector",       # documented O(QxN) broadcast baseline, as
    # knn_exact_cosine (5 query rows; scale path = ANN shortlist + re-rank)
    "stats_bootstrap_ci_mean",      # constant-B (50-row) resample-index
    # broadcast + 1-row baseline-mean broadcast — the Poisson-bootstrap fan-out
    "text_length_quantile_normalize",  # single-row global-total (N) broadcast
    # feeding h = pr*(N-1); the rank lookup itself is hash-join + window
    "event_markov_stationary",      # single-row state-count (k) broadcast
    # seeding the uniform pi0; each iteration is a hash join on <=25 rows
    "event_welch_ttest_value",      # 1-row x 1-row arm-stats crossJoin
    "text_bm25_topk",               # single-row (avgdl, n_docs) corpus-stats
    # broadcast; the posting lists themselves travel through hash joins
    "tpch_q22_global_sales_opportunity",  # Q22's scalar AVG subquery as a
    # 1-row broadcast (Spark's own scalar-subquery planning does the same)
    "stats_trend_forecast_by_nation",     # single-row min-month scalar
    # broadcast anchoring the month index
    "knn_matryoshka_dim_recall",    # documented O(QxN) broadcast exact
    # baseline per truncation width (5 query rows), as knn_exact_cosine
    "knn_hard_negative_mining",     # same broadcast exact baseline with a
    # label-mismatch join residual (5 query rows)
    "vocab_coverage_curve",         # 3-row coverage-level probe BNLJ onto
    # the vocab-sized ranked frequency table (constant-size broadcast side)
    # The five partsupp-backed TPC-H queries: the derived partsupp table
    # (plans/queries_tpch_ps.py) seeds its dbgen supplier-association
    # formula with the 1-row supplier-count scalar broadcast; Q11
    # additionally broadcasts its 1-row HAVING-threshold aggregate (the
    # standard scalar-subquery shape, as tpch_q22).
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q20_potential_part_promotion",
}


def audit_plan(plan: str) -> dict:
    # NB: plans are AQE-initial (isFinalPlan=false) — codegen stage IDs
    # only materialize at execution, so whole-stage spans are not
    # counted here; tests/test_plans.py covers codegen-sensitive shapes.
    c = plan.count
    return {
        "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "range_exchanges": len(re.findall(r"Exchange rangepartitioning", plan)),
        "broadcasts": c("BroadcastExchange"),
        "smj": c("SortMergeJoin"),
        "bhj": c("BroadcastHashJoin"),
        "shj": c("ShuffledHashJoin"),
        "bnlj": c("BroadcastNestedLoopJoin"),
        "cartesian": c("CartesianProduct"),
        "arrow_python": len(re.findall(r"ArrowEvalPython(?!UDTF)", plan))
        + c("MapInPandas")
        + c("FlatMapGroupsInPandas")
        + c("MapInArrow"),
        # Python UDTFs are per-row by definition (§2.11d, documented);
        # tracked separately so scalar row-at-a-time UDFs — which the
        # engine bans — can be flagged precisely.
        "udtf": c("EvalPythonUDTF"),
        "row_python_udtf": len(re.findall(r"BatchEvalPythonUDTF", plan)),
        "row_python": len(re.findall(r"BatchEvalPython(?!UDTF)", plan)),
        "scans": c("FileScan parquet") + c("Scan parquet"),
        "pushed_filters": len(
            re.findall(r"PushedFilters: \[[^\]]", plan)
        ),
    }


def main() -> None:
    from big_data_imdb_classifier_spark import plans
    from big_data_imdb_classifier_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="plan-audit")

    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = {a for a in argv if not a.startswith("--")}

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name, fn in sorted(plans.QUERIES.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            results[name] = {"error": str(ex)[:200]}
            flagged.append(name)
            print(f"FLAG {name}: plan failed: {ex}", flush=True)
            continue
        m = audit_plan(plan)
        flags = []
        if m["row_python"]:
            flags.append("row-at-a-time PythonUDF")
        if (m["cartesian"] or m["bnlj"]) and name not in CROSS_WHITELIST:
            flags.append("unexpected cartesian/nested-loop join")
        m["flags"] = flags
        results[name] = m
        if flags:
            flagged.append(name)
            print(f"FLAG {name}: {flags}", flush=True)

    summary = {
        "sf_dir": SF_DIR,
        "total": len(results),
        "flagged": flagged,
        "totals": {
            k: sum(r.get(k, 0) for r in results.values() if "error" not in r)
            for k in (
                "exchanges", "broadcasts", "smj", "bhj", "shj",
                "arrow_python", "udtf", "row_python",
            )
        },
        "results": results,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({"total": len(results), "flagged": flagged}))
    spark.stop()
    if flagged:
        sys.exit(1)


if __name__ == "__main__":
    main()
