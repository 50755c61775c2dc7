#!/usr/bin/env python3
"""Ratio-of-ratios STREAM comparison (VERDICT r15 #3).

Each STREAM row carries `calib_eps`, a same-instant pinned calibration
rate. Cross-round throughput reads divide each row's rate by its own
calibration rate, then compare THOSE ratios across rounds — host/tenant
drift cancels. Usage:

    python3 tools/stream_ratio.py STREAM_r15.json STREAM_r16.json

Prints a per-row table (old/new rate, old/new rate÷calib, the
ratio-of-ratios) and flags rows whose calibrated ratio moved >15%.
"""
import json
import sys


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            m = d.get("metric", "")
            if "calib_eps" in d and "value" in d and d.get("calib_eps", 0) > 0:
                rows[m] = (d["value"], d["calib_eps"])
    return rows


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    flagged = []
    hdr = f"{'metric':46s} {'old':>9s} {'new':>9s} {'old/cal':>8s} {'new/cal':>8s} {'RoR':>6s}"
    print(hdr)
    for m in sorted(set(old) & set(new)):
        ov, oc = old[m]
        nv, nc = new[m]
        orr, nrr = ov / oc, nv / nc
        ror = nrr / orr if orr else float("nan")
        mark = " <-- >15%" if abs(ror - 1.0) > 0.15 else ""
        if mark:
            flagged.append((m, ror))
        print(f"{m:46s} {ov:9.0f} {nv:9.0f} {orr:8.3f} {nrr:8.3f} {ror:6.2f}{mark}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("only in old:", ", ".join(only_old))
    if only_new:
        print("only in new:", ", ".join(only_new))
    print(f"\nflagged (ratio-of-ratios outside 0.85-1.15): {len(flagged)}")
    for m, r in flagged:
        print(f"  {m}: {r:.2f}")


if __name__ == "__main__":
    main()
