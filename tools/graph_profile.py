"""Per-job/per-stage profile of the iterative graph queries (round 10,
r9 VERDICT task 7: "one clean-window profile each [graph_bfs_levels,
graph_copurchase_pagerank]; if checkpoint cadence or edge-build
shuffles show non-inherent cost, apply §2.1; otherwise commit the
profile as the inherence proof").

Runs each named query exactly as declared (construction + noop
execution, guide §1.4), then reads the JVM AppStatusStore for every job
the run submitted: wall duration, task count, and the per-stage shuffle
read/write + input bytes + executor run time. That decomposes the
query's cost into its real phases — edge build (the first big
aggregation feeding persist), per-hop/per-iteration joins, eager
localCheckpoints — without restructuring the query under measurement.

Usage: python tools/graph_profile.py [--out PATH] name [name...]
"""

from __future__ import annotations

import json
import os
import sys
import time

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
        raise SystemExit("usage: graph_profile.py [--out PATH] name...")

    plans.load_all()
    unknown = [n for n in args if n not in plans.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="graph-profile")
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    def jvm_gc() -> None:
        try:
            sc._jvm.System.gc()
        except Exception:
            pass

    def probe() -> float:
        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        (
            spark.range(0, 64_000_000, 1, 32)
            .select(F.xxhash64("id").alias("h"))
            .agg(F.sum("h"))
            .collect()
        )
        return round(time.perf_counter() - t0, 3)

    def _opt(o):
        return o.get() if o.isDefined() else None

    def jobs_since(min_job_id: int) -> list[dict]:
        rows = []
        jl = store.jobsList(None)
        for i in range(jl.size()):
            j = jl.apply(i)
            if j.jobId() <= min_job_id:
                continue
            sub, comp = _opt(j.submissionTime()), _opt(j.completionTime())
            dur = (
                round((comp.getTime() - sub.getTime()) / 1000.0, 3)
                if sub is not None and comp is not None
                else None
            )
            rows.append(
                {
                    "job_id": j.jobId(),
                    "desc": (_opt(j.description()) or j.name())[:120],
                    "sec": dur,
                    "n_tasks": j.numTasks(),
                    "stage_ids": sorted(
                        j.stageIds().apply(k) for k in range(j.stageIds().size())
                    ),
                }
            )
        rows.sort(key=lambda r: r["job_id"])
        return rows

    def stages_for(stage_ids: set[int]) -> list[dict]:
        rows = []
        # Spark 4.1 signature: stageList(statuses, details,
        # withSummaries, unsortedQuantiles, taskStatus) — Scala default
        # args are invisible to py4j, so pass them all explicitly.
        jvm = sc._jvm
        sl = store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            sc._gateway.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
        for i in range(sl.size()):
            s = sl.apply(i)
            if s.stageId() not in stage_ids:
                continue
            rows.append(
                {
                    "stage_id": s.stageId(),
                    "name": s.name()[:100],
                    "n_tasks": s.numTasks(),
                    "executor_run_ms": s.executorRunTime(),
                    "input_mb": round(s.inputBytes() / 1e6, 2),
                    "shuffle_read_mb": round(s.shuffleReadBytes() / 1e6, 2),
                    "shuffle_write_mb": round(s.shuffleWriteBytes() / 1e6, 2),
                    "spill_disk_mb": round(s.diskBytesSpilled() / 1e6, 2),
                }
            )
        rows.sort(key=lambda r: r["stage_id"])
        return rows

    results: dict[str, dict] = {}
    for name in args:
        fn = plans.QUERIES[name]
        jvm_gc()
        # warm (un-timed): codegen, page cache
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        jvm_gc()
        jl = store.jobsList(None)
        last_id = max(
            (jl.apply(i).jobId() for i in range(jl.size())), default=-1
        )
        p0 = probe()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.catalog.clearCache()
        jobs = jobs_since(last_id)
        # drop the calibration probe's own job (its desc is this file's
        # collect call site, not the query's)
        jobs = [j for j in jobs if "graph_profile" not in j["desc"]]
        sids: set[int] = set()
        for j in jobs:
            sids.update(j["stage_ids"])
        results[name] = {
            "probe_sec": p0,
            "construction_sec": round(t1 - t0, 3),
            "execution_sec": round(t2 - t1, 3),
            "jobs": jobs,
            "stages": stages_for(sids),
        }
        print(
            f"{name}: c={t1 - t0:.3f}s e={t2 - t1:.3f}s "
            f"jobs={len(jobs)} probe={p0}"
        )
        for j in jobs:
            print(f"  job {j['job_id']:4d} {j['sec']}s tasks={j['n_tasks']:5d} {j['desc'][:80]}")

    if out:
        with open(out, "w") as fh:
            json.dump(
                {"sf_dir": SF_DIR, "results": results}, fh, indent=1, sort_keys=True
            )
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
