#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate: run
graft.Verify output against DuckDB oracles and diff. Dev tooling only —
the Scala library has no python/duckdb dependency.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
                [--skip-recursive] [--only=a,b,...]

--skip-recursive (r20, VERDICT r19 #4): drop every oracle whose SQL uses
a recursive CTE — the clustering fixpoints that dominate the 26-min full
sf0.1 DuckDB pass but are already covered at sf0.01 — making the pruned
sf0.1 subset cheap enough to be a STANDING per-round gate (the r19
quality_score rounding tie is the existence proof that bigger scale
points catch real bugs). Membership is mechanical (a SQL text test), so
a new clustering oracle is pruned automatically and everything else is
in by default.
"""
import json
import sys
import time

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, skip_recursive: bool = False,
         only=None, skip=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    if skip:
        dropped = sorted(set(oracles) & set(skip))
        oracles = {k: v for k, v in oracles.items() if k not in skip}
        print(f"skip: pruned {len(dropped)} named oracles: "
              f"{', '.join(dropped)}")
    if skip_recursive:
        skipped = sorted(k for k, v in oracles.items()
                         if "RECURSIVE" in v.upper())
        oracles = {k: v for k, v in oracles.items() if k not in skipped}
        print(f"skip-recursive: pruned {len(skipped)} recursive-CTE "
              f"oracles (covered at sf0.01): {', '.join(skipped)}")
    failures = 0
    t_all = time.monotonic()
    for name, sql in sorted(oracles.items()):
        t_q = time.monotonic()
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as ex:
            print(f"FAIL {name}: no spark result ({ex})")
            failures += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle sql error: {str(ex)[:200]}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        gs = got.sort_values(by=list(got.columns), ignore_index=True)
        es = exp.sort_values(by=list(exp.columns), ignore_index=True)
        mismatch = []
        for c in got.columns:
            gv, ev = gs[c], es[c]
            if str(gv.dtype) != str(ev.dtype):
                mismatch.append(f"{c}: dtype {gv.dtype} != {ev.dtype}")
            try:
                eq = (gv == ev) | (gv.isna() & ev.isna())
            except Exception:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                bad = (~eq).idxmax()
                mismatch.append(f"{c}: {int((~eq).sum())} diffs, e.g. row {bad}: {gv[bad]!r} != {ev[bad]!r}")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch[:4]))
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows, {time.monotonic() - t_q:.1f}s)", flush=True)
    print(f"TOTAL {len(oracles)} oracles in {time.monotonic() - t_all:.1f}s, {failures} failures")
    return failures


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    only_arg = next((f.split("=", 1)[1].split(",") for f in flags
                     if f.startswith("--only=")), None)
    skip_arg = next((f.split("=", 1)[1].split(",") for f in flags
                     if f.startswith("--skip=")), None)
    sys.exit(1 if main(args[0], args[1],
                       skip_recursive="--skip-recursive" in flags,
                       only=set(only_arg) if only_arg else None,
                       skip=set(skip_arg) if skip_arg else None) else 0)
