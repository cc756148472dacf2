"""Runtime exchange-reuse evidence (round 10, r9 VERDICT task 6).

Three r9 optimizations rest on RUNTIME reuse of canonically-identical
exchange subtrees (histogram_equidepth_price's binning branch,
text_length_quantile_normalize's derived global histogram,
dedup_incremental_new_vs_corpus's repeated corpus scans): their STATIC
plans still show duplicated subtrees because AQE's initial plan does
not mark reuse — stage dedup happens when AQE materializes query
stages. This probe closes the evidence gap: it EXECUTES each query
(collect — ties the execution to the DataFrame's own QueryExecution so
the final adaptive plan is inspectable; these queries return small
results), then reads the FINAL executed plan and counts

  - ReusedExchange / ReusedSubquery nodes (reuse fired),
  - Exchange nodes that actually materialized,
  - parquet scans that actually ran,

plus the host-independent job/stage/task counts from the status
tracker around the action.

Usage: python tools/runtime_reuse_probe.py [--out PATH] name [name...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from big_data_imdb_classifier_spark import plans
    from big_data_imdb_classifier_spark.session import get_spark

    args = sys.argv[1:]
    out = None
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    if not args:
        raise SystemExit("usage: runtime_reuse_probe.py [--out PATH] name...")

    plans.load_all()
    unknown = [n for n in args if n not in plans.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="runtime_reuse_probe")
    tracker = spark.sparkContext.statusTracker()
    results = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"reuse-probe: {name}")
        df = plans.QUERIES[name](spark, SF_DIR)
        jobs0 = len(tracker.getJobIdsForGroup(None))
        n_rows = len(df.collect())
        jobs1 = len(tracker.getJobIdsForGroup(None))
        final = df._jdf.queryExecution().executedPlan().toString()
        counts = {
            "reused_exchange": len(re.findall(r"\bReusedExchange\b", final)),
            "reused_subquery": len(re.findall(r"\bReusedSubquery\b", final)),
            # AQE wraps materialized stages as ShuffleQueryStage /
            # BroadcastQueryStage; each DISTINCT stage id is one
            # materialized exchange, repeats are reuse.
            "shuffle_stage_ids": sorted(
                set(re.findall(r"ShuffleQueryStage (\d+)", final))
            ),
            "shuffle_stage_refs": len(
                re.findall(r"ShuffleQueryStage \d+", final)
            ),
            "broadcast_stage_ids": sorted(
                set(re.findall(r"BroadcastQueryStage (\d+)", final))
            ),
            "broadcast_stage_refs": len(
                re.findall(r"BroadcastQueryStage \d+", final)
            ),
            "exchange_nodes": len(re.findall(r"\bExchange\b", final)),
            "parquet_scans": len(
                re.findall(r"FileScan parquet|Scan parquet", final)
            ),
            "is_final_plan": "isFinalPlan=true" in final,
            "jobs_ran": jobs1 - jobs0,
            "result_rows": n_rows,
        }
        results[name] = counts
        print(name, json.dumps(counts), flush=True)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    record = {"sf_dir": SF_DIR, "queries": results}
    if out:
        with open(out, "w") as fh:
            json.dump(record, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
