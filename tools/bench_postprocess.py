"""Post-process a `bench.py --all` run into the round artifacts:

* BENCH_ALL_r{N}.json — the detail record (first stdout line),
  pretty-printed for diffability;
* BENCHSPREAD_r{N}.json — the isolated-tail spread ledger derived from
  it (sweep vs isolated per query, the in-sweep inflation criterion),
  same shape the r5+ rounds recorded by hand.

Usage: python tools/bench_postprocess.py RAW_STDOUT BENCH_ALL BENCHSPREAD
"""

from __future__ import annotations

import json
import sys

CRITERION = 1.5  # sweep/isolated ratio above which a row is flagged


def main() -> None:
    raw_path, all_path, spread_path = sys.argv[1:4]
    with open(raw_path) as fh:
        detail = json.loads(fh.readline())
    assert detail.get("metric") == "headline_wall_sec_detail", "not a detail line"
    with open(all_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)

    rows = []
    for name, iso in sorted(
        detail.get("isolated", {}).items(), key=lambda kv: -kv[1]
    ):
        sweep = detail["queries"].get(name)
        ratio = round(sweep / max(iso, 1e-9), 3) if sweep else None
        rows.append(
            {
                "query": name,
                "sweep_sec": sweep,
                "isolated_sec": iso,
                "sweep_over_isolated": ratio,
                "over_criterion": bool(ratio and ratio > CRITERION),
            }
        )
    spread = {
        "criterion": CRITERION,
        "n_over": sum(r["over_criterion"] for r in rows),
        "rows": rows,
        "calibration_start_sec": detail.get("calibration_start_sec"),
        "calibration_end_sec": detail.get("calibration_end_sec"),
        **(
            {"calibration_series": detail["calibration_series"]}
            if detail.get("calibration_series")
            else {}
        ),
    }
    with open(spread_path, "w") as fh:
        json.dump(spread, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "sweep_total": detail["value"],
                "isolated_total": detail.get("isolated_total"),
                "n_over": spread["n_over"],
                "probes": [
                    detail.get("calibration_start_sec"),
                    detail.get("calibration_end_sec"),
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
