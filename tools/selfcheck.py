#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, replay each oracle SQL in DuckDB over the same parquet tables,
and compare row-by-row (columns sorted by name, like the driver's hash).

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
Dev-only tool — the engine itself has no Python dependency.
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
SKIP_VERIFY = os.environ.get("SKIP_VERIFY") == "1"

if not SKIP_VERIFY:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-3000:])
    if r.returncode != 0:
        sys.exit("verify run failed")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{OUT}/{name}")
        want = con.execute(sql).df()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: load/exec error: {e}")
        continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    status = []
    if list(got.columns) != list(want.columns):
        status.append(f"cols {list(got.columns)} != {list(want.columns)}")
    elif got.shape != want.shape:
        status.append(f"shape {got.shape} != {want.shape}")
    else:
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a.astype(str).fillna("<NA>") ==
                      b.astype(str).fillna("<NA>")).all()
            except Exception as e:
                eq = False
            if not eq:
                bad = (a.astype(str) != b.astype(str))
                i = bad.idxmax()
                status.append(
                    f"col {c} differs (first at row {i}: "
                    f"{a.iloc[i]!r} [{a.dtype}] vs {b.iloc[i]!r} [{b.dtype}])")
    if status:
        fails.append(name)
        print(f"FAIL {name}: " + "; ".join(status))
    else:
        print(f"ok   {name} ({got.shape[0]} rows)")

# queries with no oracle: rows-only check, driven by the declared
# manifest so a query that failed to write at all is flagged (not
# silently skipped because its dir is missing)
verified = set(oracle)
manifest_path = f"{OUT}/queries.txt"
declared = (open(manifest_path).read().split()
            if os.path.exists(manifest_path)
            else sorted(n for n in os.listdir(OUT)
                        if os.path.isdir(f"{OUT}/{n}")))
for name in sorted(declared):
    d = f"{OUT}/{name}"
    if name in verified:
        continue
    if not os.path.isdir(d):
        fails.append(name)
        print(f"FAIL {name}: no output written (query failed in Verify)")
        continue
    try:
        n = len(pd.read_parquet(d))
        print(f"rows {name} ({n} rows, no oracle)")
        if n == 0:
            fails.append(name)
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {e}")

print(f"\n{len(oracle) - len(set(fails) & set(oracle))}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
