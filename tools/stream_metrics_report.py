#!/usr/bin/env python3
"""Summarize a StreamMetricsListener JSONL capture into the per-topology
table the streaming second-decade audit records (verdict r10 #1): per
topology — trigger count, total/max trigger wall, total input rows, and
the MAX state rows / state bytes any trigger held (the number that decides
whether "watermark-bounded by design" is actually bounded at the measured
scale; q91's quadratic window was invisible to every row-level gate).

Usage: python3 tools/stream_metrics_report.py <metrics.jsonl> [--md]
Queries are attributed by the `sNN` prefix of their queryName (all
registry streams are named since r11, incl. foreachBatch sinks); unnamed
queries (ad-hoc) are grouped under '(unnamed)'.
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s100_metrics.jsonl"
md = "--md" in sys.argv

per = defaultdict(lambda: {"triggers": 0, "rows": 0, "trig_ms": 0,
                           "max_trig_ms": 0, "max_state_rows": 0,
                           "max_state_bytes": 0, "ops": set()})
for line in open(path):
    p = json.loads(line)
    name = p.get("name") or "(unnamed)"
    key = name.split("_")[0] if name.startswith("s") else name
    t = per[key]
    t["triggers"] += 1
    t["rows"] += p.get("numInputRows", 0)
    ms = p.get("durationMs", {}).get("triggerExecution", 0)
    t["trig_ms"] += ms
    t["max_trig_ms"] = max(t["max_trig_ms"], ms)
    for op in p.get("stateOperators", []):
        t["ops"].add(op.get("operatorName", "?"))
        t["max_state_rows"] = max(t["max_state_rows"], op.get("numRowsTotal", 0))
        t["max_state_bytes"] = max(t["max_state_bytes"],
                                   op.get("memoryUsedBytes", 0))

if md:
    print("| topology | state op(s) | triggers | input rows | "
          "wall s (max trig) | max state rows | max state MB |")
    print("|---|---|---|---|---|---|---|")
for k in sorted(per):
    t = per[k]
    ops = "+".join(sorted(t["ops"])) or "stateless"
    if md:
        print(f"| {k} | {ops} | {t['triggers']} | {t['rows']:,} | "
              f"{t['trig_ms']/1000:.1f} ({t['max_trig_ms']/1000:.1f}) | "
              f"{t['max_state_rows']:,} | {t['max_state_bytes']/1e6:.1f} |")
    else:
        print(f"{k}: triggers={t['triggers']} rows={t['rows']:,} "
              f"wall={t['trig_ms']/1000:.1f}s max_trig={t['max_trig_ms']/1000:.1f}s "
              f"max_state_rows={t['max_state_rows']:,} "
              f"max_state_mb={t['max_state_bytes']/1e6:.1f} ops={ops}")
