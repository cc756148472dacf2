"""Streaming throughput bench: drain the Structured Streaming twins over
the sf0.1 events backlog (availableNow trigger) and report rows/sec.

The batch bench (bench.py) covers the batch plans; this measures the
SAME event-time semantics through the streaming engine — watermarked
tumbling windows, native session windows, stateful dedup, the
applyInPandasWithState custom operator, and the watermarked
stream-stream range join — so "streaming twin" claims carry a
throughput number, not just the batch-parity tests.

Throughput = input rows / wall seconds for a full availableNow drain
(state checkpointing and watermark bookkeeping included). availableNow
processes the whole backlog as micro-batches exactly like a catch-up
run against a live source.

Usage: python tools/stream_bench.py [--out PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from big_data_imdb_classifier_spark.session import get_spark
    from big_data_imdb_classifier_spark.sources.readers import load_table
    from big_data_imdb_classifier_spark.streaming import streams as S

    spark = get_spark(app_name="stream-bench")
    n_rows = load_table(spark, SF_DIR, "events").count()

    cases = {
        "tumbling_counts": lambda ev: (S.tumbling_counts_stream(ev), "complete"),
        "session_windows": lambda ev: (S.session_window_stream(ev), "complete"),
        "dedup_within_watermark": lambda ev: (S.dedup_stream(ev), "append"),
        "running_user_totals_state": lambda ev: (
            S.running_user_totals_stream(ev),
            "update",
        ),
        "stream_stream_range_join": lambda ev: (
            S.clicks_before_purchase_join_stream(ev),
            "append",
        ),
    }

    results = {}
    for name, build in cases.items():
        table = f"sb_{name}"
        try:
            ev = S.load_events_stream(spark, SF_DIR)
            df, mode = build(ev)
            t0 = time.perf_counter()
            out = S.run_to_memory(spark, df, table, output_mode=mode,
                                  timeout_sec=600)
            out_rows = out.count()
            wall = time.perf_counter() - t0
        except Exception as ex:  # noqa: BLE001
            print(f"stream_bench: {name} failed: {ex}", file=sys.stderr)
            continue
        results[name] = {
            "sec": round(wall, 3),
            "out_rows": out_rows,
            "rows_per_sec": round(n_rows / wall),
        }
        print(
            f"{results[name]['sec']:7.2f}s  "
            f"{results[name]['rows_per_sec']:>9,} rows/s  "
            f"{out_rows:>8} out  {name}"
        )

    summary = {
        "metric": "stream_drain",
        "input_rows": n_rows,
        "sf_dir": SF_DIR,
        "cases": results,
    }
    if "--out" in sys.argv:
        i = sys.argv.index("--out") + 1
        if i >= len(sys.argv):
            raise SystemExit("--out requires a value")
        with open(sys.argv[i], "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["rows_per_sec"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
