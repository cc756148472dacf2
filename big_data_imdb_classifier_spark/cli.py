"""Generic query-runner CLI over the registry — the engine's
spark-submit-able application surface.

The reference is driven entirely from the command line
(reference movie_pipeline/classifier_pipeline.py:556-607 argparse main);
this is the analogous entry point for the Spark engine: any registered
query by name, against any scale-factor directory, with show / parquet /
noop outputs and an ``--explain`` switch that prints the formatted
physical plan (the tool used for every scale claim in COVERAGE.md).

Usage::

    python -m big_data_imdb_classifier_spark list [prefix]
    python -m big_data_imdb_classifier_spark run <query> [--sf-dir DIR]
        [--show N | --out PATH | --noop] [--explain]

``run`` defaults to ``--show 20``. ``--out`` writes parquet (distributed
write — nothing is collected to the driver); ``--noop`` executes the full
plan with the noop sink, which is how bench.py times queries.
"""

from __future__ import annotations

import argparse
import sys
import time

from .logger import get_logger

DEFAULT_SF_DIR = "/root/testdata/sf0.01"
log = get_logger(__name__)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="big_data_imdb_classifier_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered queries")
    ls.add_argument("prefix", nargs="?", default="", help="name prefix filter")

    rn = sub.add_parser("run", help="run one registered query")
    rn.add_argument("query")
    rn.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    rn.add_argument("--show", type=int, default=None, metavar="N",
                    help="print first N rows (default 20)")
    rn.add_argument("--out", default=None, metavar="PATH",
                    help="write result as parquet to PATH")
    rn.add_argument("--noop", action="store_true",
                    help="execute with the noop sink (timing mode)")
    rn.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan")
    args = ap.parse_args(argv)

    from . import plans

    plans.load_all()

    if args.cmd == "list":
        for name in sorted(plans.QUERIES):
            if name.startswith(args.prefix):
                tag = "oracle" if name in plans.ORACLES else "rows-only"
                print(f"{name}  [{tag}]")
        return 0

    if args.query not in plans.QUERIES:
        matches = sorted(n for n in plans.QUERIES if args.query in n)
        hint = f"; close matches: {', '.join(matches[:5])}" if matches else ""
        log.error("unknown query: %s%s", args.query, hint)
        return 2

    from .session import get_spark

    spark = get_spark(app_name=f"cli:{args.query}")
    df = plans.QUERIES[args.query](spark, args.sf_dir)

    if args.explain:
        df.explain("formatted")

    t0 = time.perf_counter()
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        log.info("wrote %s", args.out)
    elif args.noop:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.show(args.show if args.show is not None else 20, truncate=False)
    log.info("%s: %.3fs", args.query, time.perf_counter() - t0)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
