#!/usr/bin/env python3
"""Render the scaling-slope table from two Bench JSON lines (1x and Nx
fixtures, same entry subset). Usage:
    python3 tools/slope_report.py /tmp/slope_1x.json /tmp/slope_10x.json [N]
Each input file holds one Bench output line (optionally with sbt's
"[info] " prefix). Prints a markdown table sorted by ratio, worst first.
"""
import json
import sys

def load(path):
    for line in open(path):
        line = line.strip()
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])
    raise SystemExit(f"no bench JSON line in {path}")

a = load(sys.argv[1])
b = load(sys.argv[2])
n = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

rows = []
for q, t1 in a["queries"].items():
    t2 = b["queries"].get(q)
    if t2 is None:
        continue
    # floor the denominator: a 0.00 bench time (sub-10ms entry) must not
    # crash the report with ZeroDivisionError
    rows.append((q, t1, t2, t2 / max(t1, 1e-3)))
rows.sort(key=lambda r: -r[3])

print(f"| entry | sec(1x) | sec({n:g}x) | ratio | vs linear ({n:g}x) |")
print("|---|---|---|---|---|")
for q, t1, t2, r in rows:
    verdict = "sub-linear" if r < n * 0.9 else ("~linear" if r <= n * 1.2 else "SUPER-LINEAR")
    print(f"| {q} | {t1:.2f} | {t2:.2f} | {r:.1f}x | {verdict} |")
tot1 = sum(r[1] for r in rows)
tot2 = sum(r[2] for r in rows)
print(f"| **total** | {tot1:.1f} | {tot2:.1f} | {tot2 / tot1:.1f}x | |")
