"""Calibrated round-over-round bench comparison (round 8, VERDICT r7
task 4): both BENCH_ALL files carry the fixed-work calibration probe
since r7, so per-query movement is judged AFTER normalizing each side
by its own probe — host drift divides out, and what remains is plan or
code movement that needs an attribution.

For each common query the compared value is the ISOLATED re-timing when
both sides have one (the canonical per-query series, BENCHLOG r7
protocol — in-sweep numbers keep sweep-position noise), else the sweep
value on both sides (never mixed: an isolated-vs-sweep ratio would
manufacture movers out of protocol differences).

Usage: python tools/bench_compare.py OLD.json NEW.json [--flag 1.3]
Prints a JSON summary and the mover table; exit code stays 0 (the
attribution requirement is editorial — BENCHLOG — not a gate).
"""

from __future__ import annotations

import json
import sys


def probe(d: dict) -> float | None:
    s = d.get("calibration_start_sec")
    e = d.get("calibration_end_sec")
    if s is None or e is None:
        return None
    return (float(s) + float(e)) / 2.0


def main() -> None:
    flag = 1.3
    argv = sys.argv[1:]
    if "--flag" in argv:
        i = argv.index("--flag")
        flag = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    with open(args[0]) as fh:
        old = json.load(fh)
    with open(args[1]) as fh:
        new = json.load(fh)

    p_old, p_new = probe(old), probe(new)
    calibrated = p_old is not None and p_new is not None
    if not calibrated:
        # A side without a probe (pre-r7 artifact) gets a RAW
        # comparison — dividing by a fake probe would manufacture or
        # mask movers; the summary says which comparison ran.
        p_old = p_new = 1.0
    qo, qn = old["queries"], new["queries"]
    iso_o, iso_n = old.get("isolated", {}), new.get("isolated", {})
    common = sorted(set(qo) & set(qn))

    movers = []
    total_o = total_n = 0.0
    for name in common:
        both_iso = name in iso_o and name in iso_n
        t_o = iso_o[name] if both_iso else qo[name]
        t_n = iso_n[name] if both_iso else qn[name]
        total_o += qo[name]
        total_n += qn[name]
        norm = (t_n / p_new) / max(t_o / p_old, 1e-9)
        if norm > flag or norm < 1 / flag:
            movers.append(
                {
                    "query": name,
                    "old_sec": t_o,
                    "new_sec": t_n,
                    "normalized_ratio": round(norm, 2),
                    "series": "isolated" if both_iso else "sweep",
                }
            )
    movers.sort(key=lambda m: -m["normalized_ratio"])
    summary = {
        "common_queries": len(common),
        "calibrated": calibrated,
        "probe_old": round(p_old, 3) if calibrated else None,
        "probe_new": round(p_new, 3) if calibrated else None,
        "probe_ratio_new_over_old": round(p_new / max(p_old, 1e-9), 3)
        if calibrated
        else None,
        "sweep_total_old": round(total_o, 1),
        "sweep_total_new": round(total_n, 1),
        "sweep_total_ratio_raw": round(total_n / max(total_o, 1e-9), 3),
        "sweep_total_ratio_calibrated": round(
            (total_n / p_new) / max(total_o / p_old, 1e-9), 3
        ),
        "flag": flag,
        "n_movers": len(movers),
    }
    print(json.dumps({"summary": summary, "movers": movers}, indent=1))


if __name__ == "__main__":
    main()
