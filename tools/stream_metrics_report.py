#!/usr/bin/env python3
"""Summarize a StreamMetricsListener JSONL capture into the per-topology
table the streaming second-decade audit records (verdict r10 #1): per
topology — trigger count, total/max trigger wall, total input rows, and
the MAX state rows / state bytes any trigger held (the number that decides
whether "watermark-bounded by design" is actually bounded at the measured
scale; q91's quadratic window was invisible to every row-level gate).

--check (verdict r11 #2, the many-trigger regime gate; r13 widened the
gate main to all nine stateful mechanisms the registry ships): instead of
the summary, TREND per-trigger cost across the run and fail on the
O(state)-per-trigger class — per-trigger work must be O(batch rows), so
with equal-sized time-sliced chunks the trigger wall (and the RocksDB
iterator read volume) must stay FLAT while total state grows with every
trigger. For each query: take data triggers (numInputRows > 0) in batchId
order, drop the first two (codegen/provider warmup), compare the mean of
the last third against the mean of the first third. Fail when the last
third is BOTH >2x and >500 ms above the first (wall), or >2x and >5 MB
above (iterator bytes) — a linear per-trigger ramp over ~60 triggers
shows up as ~5x, far outside this gate; constant-cost noise stays inside
it. Complete-mode queries are exempt from the WALL trend (a complete-mode
sink re-emits O(total state) per trigger by SEMANTICS) but still checked
on iterator bytes. The exemption keys on the `<metrics>.modes` sidecar
the trigger-regime main writes (one {"name","outputMode"} line per
drive) when present — a renamed topology can neither silently re-arm the
check nor silently gain the exemption (r12 verdict) — and falls back to
the legacy "complete" name substring when the sidecar is absent (older
captures); a PRESENT sidecar missing a driven query name means capture
and sidecar are from different runs, which warns loudly before the same
fallback (r13 ADVICE). Queries with <12 data triggers are skipped (no
trend to fit) and reported as such.

--attrib NAME (verdict r13 #2): per-trigger ATTRIBUTION table for one
query — alongside wall and iterator bytes, the RocksDB custom metrics
that separate state-sweep growth from store-maintenance growth
(commit-time compaction/flush latency, background compaction volume,
writer stalls). Prints first/last-third means per series plus the wall
residual after subtracting commit-time compact+flush latency: if the
wall trend tracks compaction latency while iterator bytes stay flat,
the growth is RocksDB maintenance (amortized, bounded by store size),
not O(state) scan work — measured, not asserted.

Usage: python3 tools/stream_metrics_report.py <metrics.jsonl> [--md|--check|--attrib NAME]
Queries are attributed by the `sNN` prefix of their queryName (all
registry streams are named since r11, incl. foreachBatch sinks); unnamed
queries (ad-hoc) are grouped under '(unnamed)'. --check groups by FULL
queryName (the trigger-regime main names runs tr_*).
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s100_metrics.jsonl"
md = "--md" in sys.argv
check = "--check" in sys.argv


def iter_bytes(p):
    return sum(int(op.get("customMetrics", {})
                   .get("rocksdbTotalBytesReadThroughIterator", 0))
               for op in p.get("stateOperators", []))


def custom_sum(p, key):
    return sum(int(op.get("customMetrics", {}).get(key, 0))
               for op in p.get("stateOperators", []))


if "--attrib" in sys.argv:
    name = sys.argv[sys.argv.index("--attrib") + 1]
    # per-trigger series that separate scan work from store maintenance
    SERIES = [
        ("wall_ms", lambda p: p.get("durationMs", {}).get("triggerExecution", 0)),
        ("iter_bytes", iter_bytes),
        ("commit_compact_ms", lambda p: custom_sum(p, "rocksdbCommitCompactLatency")),
        ("commit_flush_ms", lambda p: custom_sum(p, "rocksdbCommitFlushLatency")),
        ("commit_ckpt_ms", lambda p: custom_sum(p, "rocksdbCommitCheckpointLatency")),
        ("bg_compact_ms", lambda p: custom_sum(p, "rocksdbTotalCompactionLatencyMs")),
        ("compact_write_mb", lambda p: custom_sum(p, "rocksdbTotalBytesWrittenByCompaction") / 1e6),
        ("writer_stall_ms", lambda p: custom_sum(p, "rocksdbWriterStallLatencyMs")),
        ("sst_size_mb", lambda p: custom_sum(p, "rocksdbSstFileSize") / 1e6),
    ]
    raw = []
    for line in open(path):
        p = json.loads(line)
        if p.get("name") != name or p.get("numInputRows", 0) <= 0:
            continue
        raw.append((p.get("batchId", 0), [f(p) for _, f in SERIES],
                    p.get("graftGcMs"), p.get("graftHeapUsedMb", 0)))
    # graftGcMs is CUMULATIVE per-JVM GC time spliced in by
    # StreamMetricsListener (r14) - diff it into a per-trigger series AFTER
    # the batchId sort (r14 ADVICE: a file-order diff attributed out-of-
    # order lines wrongly), clamped at 0 so a counter reset across an
    # appended second JVM run cannot produce a negative delta; absent in
    # older captures -> series of zeros
    raw.sort(key=lambda r: r[0])
    rows = []
    prev_gc = None
    for _, vals, gc, heap in raw:
        if gc is not None:
            vals = vals + [max(0, gc - prev_gc) if prev_gc is not None else 0,
                           heap]
            prev_gc = gc
        else:
            vals = vals + [0, 0]
        rows.append(vals)
    SERIES = SERIES + [("gc_delta_ms", None), ("heap_used_mb", None)]
    rows = rows[2:]  # drop 2 warmup triggers
    if len(rows) < 6:
        raise SystemExit(f"{name}: only {len(rows)+2} data triggers - no trend")
    third = len(rows) // 3
    print(f"{name}: {len(rows)} data triggers (2 warmup dropped), "
          f"thirds of {third}")
    print("note: gc_delta_ms is the JVM-wide GC spent between this query's "
          "consecutive triggers - GC from other queries' interleaved "
          "triggers lands here too (per-JVM counter, not per-query)")
    print(f"| series | first-third mean | last-third mean | ratio |")
    print("|---|---|---|---|")
    vals = {}
    for i, (label, _) in enumerate(SERIES):
        first = sum(r[i] for r in rows[:third]) / third
        last = sum(r[i] for r in rows[-third:]) / third
        ratio = last / first if first > 0 else float("nan")
        vals[label] = (first, last)
        print(f"| {label} | {first:,.1f} | {last:,.1f} | {ratio:.2f}x |")
    # the attribution readout: wall minus commit-time compact+flush —
    # if the residual trend is flat while raw wall grew, the growth IS
    # the store-maintenance latency, not per-row scan work
    rf = vals["wall_ms"][0] - vals["commit_compact_ms"][0] - vals["commit_flush_ms"][0]
    rl = vals["wall_ms"][1] - vals["commit_compact_ms"][1] - vals["commit_flush_ms"][1]
    print(f"wall residual after commit compact+flush: "
          f"{rf:,.1f} -> {rl:,.1f} ms ({rl / rf if rf > 0 else float('nan'):.2f}x)")
    sys.exit(0)


if check:
    # explicit output-mode records from the trigger-regime main (see
    # module docstring); absent for older captures -> name fallback
    import os
    modes = {}
    if os.path.exists(path + ".modes"):
        for line in open(path + ".modes"):
            m = json.loads(line)
            modes[m["name"]] = m["outputMode"]

    def is_complete(name):
        if name in modes:
            return modes[name] == "complete"
        if modes:
            # a PRESENT sidecar is supposed to cover every driven query
            # (the main truncates it at start and appends one line per
            # drive) — a missing name means the capture and sidecar are
            # from different runs; say so instead of silently reverting to
            # the legacy substring rule (r13 ADVICE)
            print(f"WARNING: {name} absent from {path}.modes - sidecar and "
                  "capture look mismatched; falling back to the legacy "
                  "'complete'-substring rule for this query")
        return "complete" in name  # legacy captures without a sidecar

    per = defaultdict(list)  # name -> [(batchId, trig_ms, iter_bytes)]
    for line in open(path):
        p = json.loads(line)
        if p.get("numInputRows", 0) <= 0:
            continue
        per[p.get("name") or "(unnamed)"].append(
            (p.get("batchId", 0),
             p.get("durationMs", {}).get("triggerExecution", 0),
             iter_bytes(p)))
    failures = []
    for name in sorted(per):
        rows = sorted(per[name])[2:]  # drop 2 warmup triggers
        if len(rows) < 10:
            print(f"{name}: only {len(rows)+2} data triggers - trend skipped")
            continue
        third = len(rows) // 3

        def trend(vals, unit, cap, floor, exempt=False):
            first = sum(vals[:third]) / third
            last = sum(vals[-third:]) / third
            ratio = last / first if first > 0 else float("inf") if last else 1.0
            bad = (not exempt) and last > cap * first and last - first > floor
            print(f"{name}: {unit} first-third={first:,.0f} "
                  f"last-third={last:,.0f} ratio={ratio:.2f}"
                  f"{' [exempt]' if exempt else ''}{' FAIL' if bad else ''}")
            if bad:
                failures.append(
                    f"{name}: per-trigger {unit} grew {ratio:.1f}x across the "
                    f"run ({first:,.0f} -> {last:,.0f}) - O(state) per trigger")

        trend([r[1] for r in rows], "wall_ms", 2.0, 500,
              exempt=is_complete(name))
        if any(r[2] for r in rows):
            trend([r[2] for r in rows], "iter_bytes", 2.0, 5_000_000)
    if failures:
        print("TRIGGER-REGIME CHECK FAILED:")
        for f in failures:
            print("  " + f)
        sys.exit(1)
    print("trigger-regime check: all per-trigger trends flat")
    sys.exit(0)

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
