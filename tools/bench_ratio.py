#!/usr/bin/env python3
"""Calibration-normalized cross-round bench comparison (VERDICT r17 #2).

graft.Bench r18+ emits `calib_rps` — the median rate of a frozen
fixed-flop arithmetic aggregation sampled at every round-robin pass
boundary. A contended capture inflates every query's wall AND deflates
calib_rps by the same contention, so dividing each query's rate
(1/wall) by the run's calib_rps cancels host drift: the judge-side
forensics BENCH_r17 needed (loadavg cross-exams, fixed-flop envelopes)
becomes one script run.

    python3 tools/bench_ratio.py BENCH_LOCAL_r17.json BENCH_LOCAL_r18.json
    python3 tools/bench_ratio.py OLD.json NEW.json --append

Per query: wall ratio new/old (raw) and, when BOTH artifacts carry
calib_rps, the ratio-of-ratios (query rate / calib rate, new vs old) —
RoR > 1 means the query got FASTER relative to the box. Artifacts
predating the calib arm (r17 and earlier) degrade to raw ratios with a
`calib: raw` note, never a silent pretend-normalization.

With --append, a single `bench_ror_summary` JSON line is appended to
the NEW artifact (idempotent: prior summary rows are replaced), so the
cross-round table ships inside the artifact.

BOX-PARITY PAIR SELECTION (r20, VERDICT r19 #3): artifacts may carry
SEVERAL capture rows (r19 ships `shipped` / `kept-alternate` /
`kept-final-head`), and the host's fixed-flop calib swings 33% between
same-HEAD captures — which capture pair to compare used to be human
judgment. The script now selects the pair itself: among all old x new
capture combinations it requires calib parity within +/-15%, scan-arm
agreement within 25% of the cpu factor, and 1-min loadavg <= 8 on both
sides, then picks the pair with the closest calib_rps (tie-broken by
scan parity). No qualifying pair -> the script REFUSES with each
combination's named rejection reason (never a silently skewed read).
`--pair I,J` forces capture I of OLD vs J of NEW for forensics.
"""
import json
import math
import sys

# declared box-parity windows (the refusal reasons cite these)
PAIR_WINDOWS = {"calib": 0.15, "scan_vs_cpu": 0.25, "loadavg1": 8.0}


def load_all(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "total" and "queries" in d:
                rows.append(d)
    if not rows:
        sys.exit(f"{path}: no bench 'total' row with a queries map")
    return rows


def cap_name(d, idx):
    return d.get("capture", f"capture{idx}")


def pair_reject_reason(o, n):
    """None if (o, n) is a box-parity pair, else the named reason."""
    oc, nc = o.get("calib_rps", 0), n.get("calib_rps", 0)
    if not (oc > 0 and nc > 0):
        return None  # pre-calib artifact: raw mode, handled by caller
    cf = oc / nc
    if abs(cf - 1) > PAIR_WINDOWS["calib"]:
        return (f"calib mismatch {cf:.3f} (window +/-"
                f"{PAIR_WINDOWS['calib']:.0%})")
    os_, ns_ = o.get("scan_calib_rps", 0), n.get("scan_calib_rps", 0)
    if os_ > 0 and ns_ > 0:
        sf = os_ / ns_
        if abs(sf / cf - 1) > PAIR_WINDOWS["scan_vs_cpu"]:
            return (f"scan arm {sf:.3f} disagrees with cpu arm {cf:.3f} "
                    f"(window {PAIR_WINDOWS['scan_vs_cpu']:.0%}) — "
                    "I/O-side degradation")
    for side, d in (("old", o), ("new", n)):
        la = (d.get("loadavg") or [0])[0]
        if la > PAIR_WINDOWS["loadavg1"]:
            return (f"{side} capture loadavg1 {la} > "
                    f"{PAIR_WINDOWS['loadavg1']} — contended box")
    return None


def select_pair(old_rows, new_rows):
    """Pick the box-parity (old, new) capture pair, or exit with every
    combination's named rejection reason."""
    if len(old_rows) == 1 and len(new_rows) == 1:
        return old_rows[0], new_rows[0], "only one capture per side"
    best, rejects = None, []
    for i, o in enumerate(old_rows):
        for j, n in enumerate(new_rows):
            reason = pair_reject_reason(o, n)
            label = f"{cap_name(o, i)} x {cap_name(n, j)}"
            if reason is not None:
                rejects.append(f"  {label}: {reason}")
                continue
            oc, nc = o.get("calib_rps", 0), n.get("calib_rps", 0)
            score = abs(math.log(oc / nc)) if oc > 0 and nc > 0 else 99.0
            os_, ns_ = o.get("scan_calib_rps", 0), n.get("scan_calib_rps", 0)
            tiebreak = abs(math.log(os_ / ns_)) if os_ > 0 and ns_ > 0 else 0.0
            if best is None or (score, tiebreak) < best[0]:
                best = ((score, tiebreak), o, n, label)
    if best is None:
        sys.exit("no box-parity capture pair within declared windows — "
                 "refusing the comparison:\n" + "\n".join(rejects))
    return best[1], best[2], f"selected {best[3]} (closest calib parity)"


def main():
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(paths) != 2:
        sys.exit("usage: bench_ratio.py OLD.json NEW.json "
                 "[--append] [--pair=I,J]")
    old_path, new_path = paths
    old_rows, new_rows = load_all(old_path), load_all(new_path)
    forced = [f for f in flags if f.startswith("--pair")]
    if forced:
        i, j = (int(x) for x in forced[0].split("=", 1)[-1].split(","))
        old, new = old_rows[i], new_rows[j]
        why = f"forced --pair {i},{j}"
    else:
        old, new, why = select_pair(old_rows, new_rows)
    print(f"captures: old={len(old_rows)} ({', '.join(cap_name(d, i) for i, d in enumerate(old_rows))})"
          f" new={len(new_rows)} ({', '.join(cap_name(d, i) for i, d in enumerate(new_rows))})")
    print(f"pair: {why}")
    oc, nc = old.get("calib_rps", 0), new.get("calib_rps", 0)
    calibrated = oc > 0 and nc > 0
    # calib_rps is work/sec; a query's comparable rate is 1/wall. The
    # ratio-of-ratios (new_rate/new_calib) / (old_rate/old_calib)
    # simplifies to (old_wall/new_wall) * (old_calib/new_calib).
    calib_factor = (oc / nc) if calibrated else 1.0
    # two-arm cross-check (r19, VERDICT r18 #4): the CPU probe is blind to
    # I/O/GC-side degradation (a discarded 85.5 s capture read calib-FLAT
    # with 12 uniformly-slower movers). When both artifacts carry the
    # frozen parquet-scan arm, the two factors must agree — a capture
    # whose scan arm sank while the cpu arm stayed flat degraded on the
    # I/O side and its wall ratios are suspect.
    os_, ns_ = old.get("scan_calib_rps", 0), new.get("scan_calib_rps", 0)
    scan_factor = (os_ / ns_) if (os_ > 0 and ns_ > 0) else None
    calib_disagree = (calibrated and scan_factor is not None and
                      abs(scan_factor / calib_factor - 1) > 0.25)
    gc_max = {p: max(d.get("gc_frac", [0]) or [0]) for p, d in
              (("old", old), ("new", new))}
    gc_flag = gc_max["new"] > 0.20 or gc_max["old"] > 0.20
    common = sorted(set(old["queries"]) & set(new["queries"]))
    movers = []
    rors = {}
    mode = "calibrated" if calibrated else "raw (old artifact predates calib_rps)"
    print(f"normalization: {mode}" +
          (f"  old_calib={oc:.0f} new_calib={nc:.0f} factor={calib_factor:.3f}"
           if calibrated else ""))
    if scan_factor is not None:
        agree = "DISAGREE — I/O-side degradation suspected" \
            if calib_disagree else "agree"
        print(f"scan arm: old={os_:.0f} new={ns_:.0f} factor={scan_factor:.3f}"
              f"  vs cpu factor {calib_factor:.3f} -> {agree}")
    if any(v > 0 for v in gc_max.values()):
        note = "  <-- HIGH GC (heap-pressure-degraded capture?)" if gc_flag else ""
        print(f"gc_frac max: old={gc_max['old']:.3f} new={gc_max['new']:.3f}{note}")
    hdr = f"{'query':40s} {'old_s':>8s} {'new_s':>8s} {'wall_x':>7s} {'RoR':>6s}"
    print(hdr)
    for q in common:
        ov, nv = old["queries"][q], new["queries"][q]
        if ov <= 0 or nv <= 0:
            continue
        wall_x = nv / ov  # >1 = slower raw wall
        ror = (ov / nv) * calib_factor  # >1 = faster, box-normalized
        rors[q] = round(ror, 3)
        mark = " <-- >30%" if (ror > 1.30 or ror < 1 / 1.30) else ""
        if mark:
            movers.append((q, ror))
        print(f"{q:40s} {ov:8.3f} {nv:8.3f} {wall_x:7.2f} {ror:6.2f}{mark}")
    # both sums restricted to queries valid on BOTH sides (ADVICE r18: the
    # mismatched filters counted a one-side-only-valid query in one sum but
    # not the other, skewing the headline ratio), and guarded against an
    # empty/zero common set
    valid = [q for q in common
             if old["queries"][q] > 0 and new["queries"][q] > 0]
    ow = sum(old["queries"][q] for q in valid)
    nw = sum(new["queries"][q] for q in valid)
    if ow > 0 and nw > 0:
        print(f"\ncommon-{len(valid)} wall: old {ow:.1f}s new {nw:.1f}s "
              f"raw {nw / ow:.3f}x  calib-normalized speedup {ow / nw * calib_factor:.3f}x")
    else:
        print("\nno queries valid on both sides — skipping aggregate ratios")
    ocpu = old.get("cpu_queries", {})
    ncpu = new.get("cpu_queries", {})
    cpu_common = [q for q in common if ocpu.get(q, 0) > 0 and ncpu.get(q, 0) > 0]
    if cpu_common:
        oc_t = sum(ocpu[q] for q in cpu_common)
        nc_t = sum(ncpu[q] for q in cpu_common)
        print(f"common-{len(cpu_common)} cpu:  old {oc_t:.1f}s new {nc_t:.1f}s "
              f"raw {nc_t / oc_t:.3f}x")
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_old:
        print("only in old:", ", ".join(only_old))
    if only_new:
        print("only in new:", ", ".join(only_new))
    print(f"\nmovers (calib-normalized RoR outside 0.77-1.30): {len(movers)}")
    for q, r in sorted(movers, key=lambda x: x[1]):
        print(f"  {q}: {r:.2f} ({'faster' if r > 1 else 'slower'})")
    if "--append" in flags:
        summary = {
            "metric": "bench_ror_summary",
            "vs": old_path.split("/")[-1],
            "pair_selection": why,
            "pair_old": cap_name(old, old_rows.index(old)),
            "pair_new": cap_name(new, new_rows.index(new)),
            "normalization": "calibrated" if calibrated else "raw",
            "calib_factor": round(calib_factor, 4),
            "common_queries": len(valid),
            "wall_raw_x": round(nw / ow, 4) if ow > 0 else None,
            "wall_calib_speedup_x":
                round(ow / nw * calib_factor, 4) if nw > 0 else None,
            "scan_calib_factor":
                round(scan_factor, 4) if scan_factor is not None else None,
            "calib_arms_disagree": calib_disagree,
            "gc_frac_max_new": round(gc_max["new"], 4),
            "movers": {q: round(r, 3) for q, r in movers},
            "only_in_old": only_old,
            "only_in_new": only_new,
        }
        with open(new_path) as f:
            kept = [
                line for line in f
                if not (line.strip() and
                        json.loads(line).get("metric") == "bench_ror_summary")
            ]
        with open(new_path, "w") as f:
            f.writelines(kept)
            f.write(json.dumps(summary) + "\n")
        print(f"\nwrote bench_ror_summary row to {new_path} (prior summary rows replaced)")


if __name__ == "__main__":
    main()
