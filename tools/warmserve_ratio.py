#!/usr/bin/env python3
"""Per-query warm-serve cost envelope across rounds (r20, VERDICT r19 #7).

WARMSERVE_r{N}.json carries one `warmserve` row per scale point with each
store-backed query's fresh-JVM serve wall/cpu. Bench movers have had
cross-round RoR tracking since r17; serve costs did not — a creeping
serve regression (a store quietly degrading toward rescan behavior)
would only surface when it got bad enough to fail the ColdBuilds gate.
This script matches the rows of two WARMSERVE artifacts by `sf` basename
and prints per-query wall/cpu ratios (new/old; >1 = slower), flagging
queries outside the envelope. With --append, a `warmserve_ror` summary
row is written into the NEW artifact (idempotent), so the envelope ships
with the capture.

    python3 tools/warmserve_ratio.py WARMSERVE_r19.json WARMSERVE_r20.json --append

Serve walls at small scale are sub-second and jittery; the flag
threshold is deliberately loose (1.5x on cpu, the steadier signal) and
cpu is the headline — wall is printed for context. Deliberate re-
contract-per-serve anchors (dedup_components_incremental at sf10, ~100
cpu-s BY DESIGN) are expected to be flat round-over-round like everything
else; the envelope tracks drift, not absolute cost.
"""
import json
import sys

FLAG_CPU_X = 1.5


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "warmserve" and "queries" in d:
                key = d.get("sf", "?").rstrip("/").split("/")[-1]
                rows[key] = d
    if not rows:
        sys.exit(f"{path}: no warmserve rows")
    return rows


def main():
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(paths) != 2:
        sys.exit("usage: warmserve_ratio.py OLD.json NEW.json [--append]")
    old_path, new_path = paths
    old, new = load(old_path), load(new_path)
    common_sf = sorted(set(old) & set(new))
    if not common_sf:
        sys.exit(f"no common scale points: old={sorted(old)} new={sorted(new)}")
    flagged = {}
    per_sf = {}
    for sf in common_sf:
        oq, nq = old[sf]["queries"], new[sf]["queries"]
        common = sorted(set(oq) & set(nq))
        print(f"\n== {sf} ({len(common)} common queries)")
        print(f"{'query':36s} {'old_cpu':>8s} {'new_cpu':>8s} {'cpu_x':>6s} {'wall_x':>7s}")
        rors = {}
        for q in common:
            ocpu, ncpu = oq[q].get("cpu", 0), nq[q].get("cpu", 0)
            owall, nwall = oq[q].get("wall", 0), nq[q].get("wall", 0)
            cpu_x = (ncpu / ocpu) if ocpu > 0 else None
            wall_x = (nwall / owall) if owall > 0 else None
            mark = ""
            if cpu_x is not None and cpu_x > FLAG_CPU_X:
                mark = f" <-- serve cpu regressed >{FLAG_CPU_X}x"
                flagged.setdefault(sf, {})[q] = round(cpu_x, 3)
            rors[q] = {"cpu_x": round(cpu_x, 3) if cpu_x else None,
                       "wall_x": round(wall_x, 3) if wall_x else None}
            print(f"{q:36s} {ocpu:8.2f} {ncpu:8.2f} "
                  f"{cpu_x if cpu_x else 0:6.2f} {wall_x if wall_x else 0:7.2f}{mark}")
        per_sf[sf] = rors
        only_new = sorted(set(nq) - set(oq))
        if only_new:
            print(f"new this round (no envelope yet): {', '.join(only_new)}")
    n_flagged = sum(len(v) for v in flagged.values())
    print(f"\nflagged (cpu > {FLAG_CPU_X}x): {n_flagged}")
    for sf, qs in flagged.items():
        for q, x in sorted(qs.items(), key=lambda kv: -kv[1]):
            print(f"  {sf} {q}: {x:.2f}x")
    if "--append" in flags:
        summary = {"metric": "warmserve_ror", "vs": old_path.split("/")[-1],
                   "flag_cpu_x": FLAG_CPU_X, "flagged": flagged,
                   "ror": per_sf}
        with open(new_path) as f:
            kept = [l for l in f if not (l.strip() and
                    json.loads(l).get("metric") == "warmserve_ror")]
        with open(new_path, "w") as f:
            f.writelines(kept)
            f.write(json.dumps(summary) + "\n")
        print(f"wrote warmserve_ror row to {new_path}")
    sys.exit(1 if n_flagged else 0)


if __name__ == "__main__":
    main()
