#!/usr/bin/env python3
"""Ratio-of-ratios STREAM comparison (VERDICT r15 #3, r16 #7).

Each STREAM row carries `calib_eps`, a same-instant pinned calibration
rate. Cross-round throughput reads divide each row's rate by its own
calibration rate, then compare THOSE ratios across rounds — host/tenant
drift cancels. Usage:

    python3 tools/stream_ratio.py STREAM_r16.json STREAM_r17.json
    python3 tools/stream_ratio.py STREAM_r16.json STREAM_r17.json --append

With --append, a single `stream_ror_summary` JSON line (per-metric RoR
map + flagged list vs the OLD artifact) is appended to the NEW artifact,
so the cross-round table ships inside the artifact instead of being
hand-built each round.

Rows are keyed by (metric, arm, round) — multi-row metrics such as the
components_maintain_ab arm rows no longer collapse to the last line
read (ADVICE r16). A duplicate full key is a data error: warned, first
occurrence kept.
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
                key = (m, d.get("arm"), d.get("round"))
                if key in rows:
                    print(
                        f"WARN: duplicate row key {key} in {path}; keeping first",
                        file=sys.stderr,
                    )
                    continue
                rows[key] = (d["value"], d["calib_eps"])
    return rows


def fmt_key(key):
    m, arm, rnd = key
    parts = [m] + [str(x) for x in (arm, rnd) if x is not None]
    return "/".join(parts)


def main():
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(paths) != 2:
        sys.exit("usage: stream_ratio.py OLD.json NEW.json [--append]")
    old_path, new_path = paths
    append = "--append" in flags
    old, new = load(old_path), load(new_path)
    flagged = []
    rors = {}
    hdr = f"{'metric':52s} {'old':>9s} {'new':>9s} {'old/cal':>8s} {'new/cal':>8s} {'RoR':>6s}"
    print(hdr)
    for key in sorted(set(old) & set(new), key=fmt_key):
        ov, oc = old[key]
        nv, nc = new[key]
        orr, nrr = ov / oc, nv / nc
        ror = nrr / orr if orr else float("nan")
        name = fmt_key(key)
        rors[name] = round(ror, 3)
        mark = " <-- >15%" if abs(ror - 1.0) > 0.15 else ""
        if mark:
            flagged.append((name, ror))
        print(f"{name:52s} {ov:9.0f} {nv:9.0f} {orr:8.3f} {nrr:8.3f} {ror:6.2f}{mark}")
    only_old = sorted(fmt_key(k) for k in set(old) - set(new))
    only_new = sorted(fmt_key(k) for k in set(new) - set(old))
    if only_old:
        print("only in old:", ", ".join(only_old))
    if only_new:
        print("only in new:", ", ".join(only_new))
    print(f"\nflagged (ratio-of-ratios outside 0.85-1.15): {len(flagged)}")
    for m, r in flagged:
        print(f"  {m}: {r:.2f}")
    if append:
        summary = {
            "metric": "stream_ror_summary",
            "vs": old_path.split("/")[-1],
            "common_rows": len(rors),
            "ror": rors,
            "flagged": {m: round(r, 3) for m, r in flagged},
            "only_in_old": only_old,
            "only_in_new": only_new,
        }
        # idempotent: replace any prior summary row (a re-run after a
        # per-row re-measure must not leave two conflicting summaries)
        with open(new_path) as f:
            kept = [
                line for line in f
                if not (line.strip() and
                        json.loads(line).get("metric") == "stream_ror_summary")
            ]
        with open(new_path, "w") as f:
            f.writelines(kept)
            f.write(json.dumps(summary) + "\n")
        print(f"\nwrote stream_ror_summary row to {new_path} (prior summary rows replaced)")


if __name__ == "__main__":
    main()
