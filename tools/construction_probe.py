"""Per-query CONSTRUCTION cost probe: wall time, Spark JOB COUNT, and
noop execution time for named queries.

The optimization target this round is driver-coordinated construction
work (counts, eager checkpoints, bounded collects that run BEFORE the
timed action). Wall seconds on this host bounce 2-5x minute-to-minute
(BENCHLOG r8/r9 host epochs), so the primary evidence for "construction
got cheaper" is the HOST-INDEPENDENT job count: the number of Spark
jobs the query function launches before returning its DataFrame,
read from the status tracker. A removed `.count()` is one job gone no
matter what the host is doing.

Protocol per query: JVM GC, one un-timed warm construction+noop at the
measured SF, then REPS timed (construction, execution) pairs — median
reported — with the job-count delta taken on the LAST rep and a 1-rep
fixed-work calibration probe stamped per query.

Usage: python tools/construction_probe.py [--out PATH] name [name...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")), 1)


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
        raise SystemExit("usage: construction_probe.py [--out PATH] name...")

    plans.load_all()
    unknown = [n for n in args if n not in plans.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="construction-probe")
    sc = spark.sparkContext

    def jvm_gc() -> None:
        try:
            sc._jvm.System.gc()
        except Exception:
            pass

    def n_jobs() -> int:
        # Total jobs submitted so far (all groups). Monotone within a
        # session; deltas around a code region count its jobs.
        t = sc.statusTracker()
        ids = list(t.getJobIdsForGroup(None) or [])
        for g in t.getJobIdsForGroup("") or []:
            ids.append(g)
        return max(ids, default=-1)

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

    results: dict[str, dict] = {}
    for name in args:
        fn = plans.QUERIES[name]
        jvm_gc()
        # warm (un-timed): codegen, broadcast, page cache
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        except Exception as ex:
            results[name] = {"error": repr(ex)[:300]}
            continue
        cons, execu = [], []
        jobs_delta = -1
        for rep in range(REPS):
            jvm_gc()
            j0 = n_jobs()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            j1 = n_jobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.catalog.clearCache()
            cons.append(t1 - t0)
            execu.append(t2 - t1)
            jobs_delta = j1 - j0
        cons.sort()
        execu.sort()
        results[name] = {
            "construction_sec": round(cons[len(cons) // 2], 3),
            "execution_sec": round(execu[len(execu) // 2], 3),
            "construction_jobs": jobs_delta,
            "probe_sec": probe(),
        }
        r = results[name]
        print(
            f"{name:42s} c={r['construction_sec']:6.3f}s "
            f"e={r['execution_sec']:6.3f}s jobs={r['construction_jobs']:3d} "
            f"probe={r['probe_sec']}"
        )

    if out:
        with open(out, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "reps": REPS, "results": results}, fh, indent=1, sort_keys=True)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
