#!/usr/bin/env python3
"""Regenerate SCALE.md's per-query two-scale telemetry appendix from
the committed bench artifacts. CoverageCountsSpec pins that every
declared query id appears in SCALE.md; this table is the guarantee —
one row per benched query with its sf0.1 and 100x seconds side by
side, so a physically-impossible pair (faster at 100x than at sf0.1
beyond noise) is visible at a glance, the exact tell that exposed the
r12 contention pollution.

Usage: python3 tools/telemetry_table.py [sf01_artifact] [sf10_artifact]
Defaults: BENCH_CLEAN.json (falling back to BENCH_FULL.json) and
BENCH_SF10.json. Rewrites the section between the BEGIN/END markers
in SCALE.md (appends it if absent). Dev-only tool.
"""
import json, os, sys

BEGIN = "<!-- BEGIN GENERATED TELEMETRY (tools/telemetry_table.py) -->"
END = "<!-- END GENERATED TELEMETRY -->"

sf01_path = sys.argv[1] if len(sys.argv) > 1 else (
    "BENCH_CLEAN.json" if os.path.exists("BENCH_CLEAN.json")
    else "BENCH_FULL.json")
sf10_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF10.json"

a = json.load(open(sf01_path))
b = json.load(open(sf10_path)) if os.path.exists(sf10_path) else {}
qa, qb = a.get("queries", {}), b.get("queries", {})

names = sorted(set(qa) | set(qb),
               key=lambda n: (int("".join(c for c in n.split("_")[0]
                                          if c.isdigit()) or 0), n))
rows = []
for n in names:
    t1, t10 = qa.get(n), qb.get(n)
    f1 = f"{t1:.2f}" if t1 is not None else "—"
    f10 = f"{t10:.2f}" if t10 is not None else "—"
    note = ""
    if t1 is not None and t10 is not None and t10 < t1 / 2 and t1 > 1.0:
        note = "sf0.1 number contention-suspect (faster at 100x)"
    rows.append(f"| {n} | {f1} | {f10} | {note} |")

hdr = (f"\n## Per-query two-scale telemetry (generated)\n\n"
       f"One row per benched query: seconds at sf0.1 "
       f"(`{os.path.basename(sf01_path)}`) and at the 100x rehearsal "
       f"(`{os.path.basename(sf10_path)}`), local[32]. A query "
       f"markedly FASTER at 100x than at sf0.1 is physically "
       f"impossible and flags the sf0.1 number as contention-polluted "
       f"— the r12 lesson, now visible per query. Regenerate with "
       f"`python3 tools/telemetry_table.py` after committing new "
       f"bench artifacts.\n\n"
       f"| query | sf0.1 s | 100x s | note |\n|---|---|---|---|\n")
section = BEGIN + hdr + "\n".join(rows) + "\n" + END

doc = open("SCALE.md").read()
if BEGIN in doc:
    pre = doc[:doc.index(BEGIN)]
    post = doc[doc.index(END) + len(END):]
    doc = pre + section + post
else:
    doc = doc.rstrip() + "\n\n" + section + "\n"
open("SCALE.md", "w").write(doc)
print(f"wrote {len(rows)} telemetry rows from {sf01_path} + {sf10_path}")
