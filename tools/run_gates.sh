#!/usr/bin/env bash
# The round's standing correctness gates (verdict r7 #6): the sf0.01 oracle
# gate AND the same gate at the 10x fixture (rebuilt if absent), then the
# oracle fuzzer at both scales. Scale-dependent divergence is a proven bug
# class (q03's 2^53 envelope was caught ONLY at 10x), so the 10x pass is
# not optional. Run serially — never alongside a bench (CPU contention
# corrupts timings) or a concurrent sbt (target/ clobber).
#
# Usage: tools/run_gates.sh [--skip-fuzz]
set -u
cd "$(dirname "$0")/.."
fail=0

run() {
  echo "=== $*"
  if ! "$@"; then echo "GATE FAILED: $*"; fail=1; fi
}

run python3 tools/check_oracle.py /root/testdata/sf0.01

# decimal red-team (seconds): re-prove live that the retired decimal->
# double route diverges from DuckDB past 2^53 on the committed adversarial
# fixture and that the magnitude-proof routes stay exact / fail loudly
# (the Spark half of the same constants is pinned by DecimalEnvelopeSpec)
run python3 tools/red_team_decsum.py

# freshness = the done-marker make_scale_fixture.py writes LAST, not the
# presence of one parquet (a build that crashed between documents and
# embeddings would otherwise pass the check and fail the gate confusingly).
# The marker also records the generator's TRANSFORM_VERSION — PER MODE
# since r13 (r12 ADVICE): a fixture built by an older generator of a
# transform its mode actually applies silently fails the vintage match and
# rebuilds instead of running the gates against stale bytes (ADVICE r11),
# while a bump that cannot reach the mode's bytes (r12a touched only the
# embeddings sign derivation, which --docs-only copies unchanged) does NOT
# force a multi-hour rebuild of byte-identical output. Keep the literals
# in sync with make_scale_fixture.py TRANSFORM_VERSIONS. The docs pattern
# also accepts the legacy full-format r12a marker: markers written by the
# r12 generator predate per-mode tokens and their docs bytes are identical.
fixture_vintage="transform=r12a"
docs_vintage="transform=(r11a|r12a)"
if ! grep -qs "$fixture_vintage" /tmp/graft_sf1/_SUCCESS; then
  run python3 tools/make_scale_fixture.py /root/testdata/sf0.1 /tmp/graft_sf1 10
fi
# p72's DuckDB oracle (pairwise ground truth over CC labels) legitimately
# spills 30-60 GiB at 10x — it passed for three rounds with unlimited spill
# before the cap landed; give the 10x stage the higher budget it needs
# (still far under the free-disk headroom, still fail-fast at 100x scale).
run env GRAFT_DUCK_TEMP_CAP=60GiB python3 tools/check_oracle.py /tmp/graft_sf1

# default seeds ROTATE BY THEMSELVES (ISO year+week, e.g. 202633) so a run
# that forgets to export the env vars still samples fresh fuzz queries and
# a fresh CC closure each week — a pinned literal default re-proved the
# same 60 queries forever, the exact degenerate-sampling failure the r9 CC
# postscript diagnosed. Env overrides remain for reproducing a failure.
seed_default="$(date +%G%V)"
# record the resolved seed ONCE up front (ADVICE r10): a red gate observed
# near an ISO-week boundary is otherwise not reproducible — rerunning the
# script after the week ticks over samples different queries/closures
echo "gates: weekly default seed = $seed_default" \
  "(fuzz=${GRAFT_FUZZ_SEED:-$seed_default} cc=${GRAFT_CC_SEED:-$seed_default})"

if [ "${1:-}" != "--skip-fuzz" ]; then
  run python3 tools/fuzz_oracle.py /root/testdata/sf0.01 60 "${GRAFT_FUZZ_SEED:-$seed_default}"
  run python3 tools/fuzz_oracle.py /tmp/graft_sf1 60 "${GRAFT_FUZZ_SEED:-$seed_default}"
  # streaming differential fuzzer (verdict r10 #4; r12 added stream-stream
  # joins and transformWithState processors per verdict r11 #1; r13 added
  # ListState top-k and ValueState sessions per verdict r12 #1; r14 added
  # the seeded initial-state bootstrap per verdict r13 #1; r15 added the
  # sub-gap thin-geometry bootstrap per verdict r14 #1): randomized
  # stateful micro-batch topologies (window/session/dedup-chain/join/
  # custom-processor/liststate-topk/seeded-bootstrap/restart × watermark ×
  # key × churn) vs batch-replay twins — the s-family's grammar coverage.
  # The first 8 plans of every run are pinned to the r12/r13/r14/r15
  # families (join inner/outer, transformWithState,
  # transformWithState+restart, ListState top-k, ValueState sessions,
  # seeded bootstrap, sub-gap thin bootstrap), so 13 plans/run keeps ≥5
  # draws for the original families. Two seeds × two scales per gate run
  # (seed and seed+1, crossed over scales so a week covers all four cells
  # across the two standing invocations).
  sfz_seed="${GRAFT_FUZZ_SEED:-$seed_default}"
  run sbt -batch "runMain graft.StreamFuzz /root/testdata/sf0.01 13 $sfz_seed"
  run sbt -batch "runMain graft.StreamFuzz /tmp/graft_sf1 13 $((sfz_seed + 1))"
fi

# Scaling-slope contrast rule (verdict r12 #4, automated r13, WIRED into
# the standing path r14 per verdict r13 #6): whenever a 1x/Nx bench pair
# for the p02/p21 subset exists at the canonical paths (the spot-
# measurement recipe writes them there; override via GRAFT_SLOPE_1X /
# GRAFT_SLOPE_NX / GRAFT_SLOPE_N), the capped-control reopen rule runs as
# a GATE: exit 2 (rule FIRED - kernel-origin growth) and exit 3 (control
# missing from the pair - the measurement forgot its control) both fail.
# No pair staged -> stage skipped (most gate runs measure no new slopes).
slope_1x="${GRAFT_SLOPE_1X:-/tmp/slope_1x.json}"
slope_nx="${GRAFT_SLOPE_NX:-/tmp/slope_Nx.json}"
if [ -f "$slope_1x" ] && [ -f "$slope_nx" ]; then
  run python3 tools/slope_report.py "$slope_1x" "$slope_nx" \
    "${GRAFT_SLOPE_N:-10}" --contrast
  # CONSUME the pair once judged (r14 ADVICE): a stale pair left at the
  # canonical paths would otherwise silently gate every later run against
  # data unrelated to HEAD. The renamed files keep the record on disk;
  # slope_report.py additionally cross-checks the declared N against the
  # `sf` fields inside the two bench lines (exit 4 on a mis-scaled pair).
  mv -- "$slope_1x" "$slope_1x.checked"
  mv -- "$slope_nx" "$slope_nx.checked"
  echo "slope contrast: pair consumed -> $slope_1x.checked / $slope_nx.checked"
else
  echo "slope contrast: no staged bench pair ($slope_1x / $slope_nx) - skipped"
fi

# GRAFT_CC_SAMPLE=1 adds the 100x connected-components sampled oracle
# (check_cc_sample.py): sampled exact labels + label-substituted derived
# oracles at the docs-only 100x fixture — the one family the full DuckDB
# closure can't reach at that scale. ~15 min Spark + ~12 min DuckDB (the
# p72 contamination replay dominates); off by default, on for round close.
if [ "${GRAFT_CC_SAMPLE:-0}" = 1 ]; then
  if ! grep -qsE "$docs_vintage" /tmp/graft_sf100docs/_SUCCESS; then
    run python3 tools/make_scale_fixture.py /root/testdata/sf0.1 /tmp/graft_sf100docs 100 --docs-only
  fi
  # the sample seed rotates with the same weekly default as the fuzz seed
  run env GRAFT_CC_OUT=/tmp/cc_sample_out python3 tools/check_cc_sample.py \
    /tmp/graft_sf100docs --seed="${GRAFT_CC_SEED:-$seed_default}"
fi

# GRAFT_TRIGGER_REGIME=1 adds the many-trigger regime gate (verdict r11
# #2; r13 widened it to all nine stateful mechanisms the registry ships,
# adding ValueState sessions / initial-state bootstrap / ListState top-k
# per verdict r12 #1): replayed over the 10x events fixture
# in ~64 time-sliced micro-batches with per-trigger metrics captured, then
# a trend check that FAILS if per-trigger wall or RocksDB iterator bytes
# grow with trigger index — the O(state)-per-trigger class (r11's s18
# timer sweep) measured, not inspected. ~5-10 min; on for round close.
if [ "${GRAFT_TRIGGER_REGIME:-0}" = 1 ]; then
  if ! grep -qs "$fixture_vintage" /tmp/graft_sf1/_SUCCESS; then
    run python3 tools/make_scale_fixture.py /root/testdata/sf0.1 /tmp/graft_sf1 10
  fi
  tr_jsonl="${GRAFT_TRIGGER_REGIME_OUT:-/tmp/trigger_regime.jsonl}"
  rm -f "$tr_jsonl" "$tr_jsonl.modes"
  run env SPARK_GRAFT_STREAM_METRICS="$tr_jsonl" \
    sbt -batch "runMain graft.StreamTriggerRegime /tmp/graft_sf1 64"
  run python3 tools/stream_metrics_report.py "$tr_jsonl" --check
fi

if [ "$fail" = 0 ]; then echo "ALL GATES GREEN"; else echo "GATES RED"; fi
exit $fail
