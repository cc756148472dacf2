"""Capture ``explain('formatted')`` text per query for the optimization
round's plan-evidence files (``plans/r09/<query>_{before,after}.txt``).

Unlike tools/plan_audit.py (which parses plans into shape metrics), this
writes the RAW formatted plan so a reader can diff a query's physical
plan across an optimization. Construction-time driver work (eager
checkpoints, bounded collects) runs exactly as the bench's construction
phase does — the captured plan is the terminal DataFrame's, i.e. what
the timed action executes.

Usage: python tools/plan_capture.py --out DIR --suffix before [names...]
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from big_data_imdb_classifier_spark import plans
    from big_data_imdb_classifier_spark.session import get_spark

    args = sys.argv[1:]
    out_dir, suffix = "plans/r09", "before"
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]

    plans.load_all()
    names = args or sorted(plans.QUERIES)
    unknown = [n for n in names if n not in plans.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="plan-capture")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = plans.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {SF_DIR} ({suffix})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
