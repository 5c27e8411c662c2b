#!/usr/bin/env python3
"""Closing-bench core-count cross-check (round 19, VERDICT r18 item 9).

Reads two Bench sidecar artifacts — the main run (e.g. local[32]) and the
low-core control (e.g. local[8]) — and emits a comparison table flagging
every query whose MAIN-run min exceeds its LOW-core min. On this
hardware a query genuinely cannot be faster on a quarter of the cores,
so each flagged row is evidence the main run's number is environment-
contaminated, not a code regression (the check that, done by hand,
exonerated all 8 of round 18's phantom "regressions").

Usage: compare_core_counts.py BENCH_FULL.json BENCH_FULL_c8.json
Writes BENCH_CORE_COMPARE.json next to the first artifact.
"""
import json
import os
import sys


def main() -> int:
    main_path, low_path = sys.argv[1], sys.argv[2]
    with open(main_path) as f:
        main = json.load(f)
    with open(low_path) as f:
        low = json.load(f)
    mq, lq = main["queries"], low["queries"]
    common = sorted(set(mq) & set(lq))
    rows = []
    for name in common:
        m, l = mq[name], lq[name]
        ratio = (l / m) if m > 0 else float("nan")
        rows.append({
            "query": name,
            "main_sec": m,
            "low_sec": l,
            "low_over_main": round(ratio, 3),
            # main slower than low-core on identical code = the main
            # number is suspect; anything within 10% is jitter
            "suspect_main": bool(m > l * 1.10),
        })
    suspects = [r for r in rows if r["suspect_main"]]
    print(f"core-count cross-check: {len(common)} common queries, "
          f"{len(suspects)} suspect main-run rows "
          f"(main min > 1.1x low-core min)")
    if suspects:
        print(f"{'query':40s} {'main_s':>8s} {'low_s':>8s} {'low/main':>9s}")
        for r in sorted(suspects, key=lambda r: r["low_over_main"]):
            print(f"{r['query']:40s} {r['main_sec']:8.3f} "
                  f"{r['low_sec']:8.3f} {r['low_over_main']:9.3f}")
    out = {
        "main_artifact": os.path.basename(main_path),
        "low_artifact": os.path.basename(low_path),
        "n_common": len(common),
        "n_suspect_main": len(suspects),
        "suspect_queries": [r["query"] for r in suspects],
        "rows": rows,
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(main_path)),
                            "BENCH_CORE_COMPARE.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
