#!/usr/bin/env python3
"""Render the scaling-slope table from two Bench JSON lines (1x and Nx
fixtures, same entry subset). Usage:
    python3 tools/slope_report.py /tmp/slope_1x.json /tmp/slope_10x.json [N] \
        [--contrast [UNCAPPED:CAPPED]]
Each input file holds one Bench output line (optionally with sbt's
"[info] " prefix). Prints a markdown table sorted by ratio, worst first.

--contrast automates the p02/p21 reopen rule exactly as written in
SCALING.md r12 ("p02 reopen trigger, examined"): the uncapped kernel's
slope alone cannot distinguish pair-walk growth from shared
infrastructure cost (index build, exchanges, GC) — the capped CONTROL
kernel pays the shared cost identically, so the discriminator is the
uncapped/capped wall CONTRAST across the scale step. The rule FIRES
(exit 2 — port p21's df-cap to p02, keep the pair inverted) only when
BOTH hold:
  1. the uncapped decade-equivalent slope exceeds the ~12x/decade bound
     (ratio ** (1/log10 N) for a 1x->Nx step), AND
  2. the contrast at the larger scale exceeds WIDEN (1.5x) times the
     contrast at the base scale of the SAME run pair (the written rule's
     "its 100x value" — pass the 100x line as the 1x input).
Anything else RE-ARMS with the reason printed. A subset run that forgot
to bench the control exits 3: the control is what makes the rule
exercisable, forgetting it is itself an error (verdict r12 #4).
"""
import json
import math
import sys

DECADE_BOUND = 12.0   # the ~12x/decade reopen bound (SCALING.md r10 #5)
WIDEN = 1.5           # contrast-widening fire threshold (SCALING.md r12)
DEFAULT_PAIR = "p02_dedup_ngram_jaccard:p21_dedup_jaccard_dfcap"


def load(path):
    for line in open(path):
        line = line.strip()
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    argv = sys.argv[1:]
    contrast_pair = None
    if "--contrast" in argv:
        i = argv.index("--contrast")
        # The optional UNCAPPED:CAPPED value must be exactly two ':'-joined
        # entry names. Positional args here are bench-JSON paths or the
        # scale factor N — neither contains ':' — so a following arg WITH a
        # colon is unambiguously the pair; validate its shape explicitly
        # instead of inferring well-formedness from the substring (a
        # malformed 'a:b:c' used to traceback past the designed exit codes).
        nxt = argv[i + 1] if i + 1 < len(argv) and ":" in argv[i + 1] else None
        if nxt is not None and len(nxt.split(":")) != 2:
            raise SystemExit(
                f"--contrast value must be UNCAPPED:CAPPED (one colon), got "
                f"{nxt!r} - e.g. {DEFAULT_PAIR}")
        contrast_pair = nxt or DEFAULT_PAIR
        argv = [a for j, a in enumerate(argv)
                if j != i and not (nxt and j == i + 1)]

    a = load(argv[0])
    b = load(argv[1])
    n = float(argv[2]) if len(argv) > 2 else 10.0

    # Cross-check the declared scale step N against the `sf` dirs recorded
    # inside the two bench lines (r14 ADVICE: a pair staged at a different
    # scale step without GRAFT_SLOPE_N set would compute the decade-
    # equivalent slope with the wrong N). Bench stamps sf as the fixture
    # dir; the trailing sf<number> token gives the scale. Unparseable dirs
    # (custom fixture names) are warned about, not fatal — the consume-
    # and-rename in run_gates.sh already prevents stale re-use.
    import re

    def sf_of(d):
        m = re.findall(r"sf([0-9]+(?:\.[0-9]+)?)", str(d.get("sf", "")))
        return float(m[-1]) if m else None

    sfa, sfb = sf_of(a), sf_of(b)
    if sfa and sfb:
        implied = sfb / sfa
        if abs(implied / n - 1.0) > 0.01:
            print(f"slope inputs declare sf={sfa:g} -> sf={sfb:g} "
                  f"(a {implied:g}x step) but N={n:g} was passed - "
                  "mis-scaled pair, refusing to compute slopes (exit 4)")
            return 4
    elif sfa is None or sfb is None:
        print(f"warning: cannot parse sf from bench inputs "
              f"({a.get('sf')!r} / {b.get('sf')!r}) - N={n:g} unvalidated")

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
        verdict = ("sub-linear" if r < n * 0.9
                   else ("~linear" if r <= n * 1.2 else "SUPER-LINEAR"))
        print(f"| {q} | {t1:.2f} | {t2:.2f} | {r:.1f}x | {verdict} |")
    tot1 = sum(r[1] for r in rows)
    tot2 = sum(r[2] for r in rows)
    print(f"| **total** | {tot1:.1f} | {tot2:.1f} | {tot2 / tot1:.1f}x | |")

    if contrast_pair is None:
        return 0

    unc, cap = contrast_pair.split(":")
    missing = [q for q in (unc, cap)
               if q not in a["queries"] or q not in b["queries"]]
    if missing:
        print(f"\ncontrast rule: MISSING {missing} from the bench inputs - "
              "the capped control must be measured in the same runs as the "
              "uncapped kernel (exit 3)")
        return 3
    t1u, t2u = a["queries"][unc], b["queries"][unc]
    t1c, t2c = a["queries"][cap], b["queries"][cap]
    ratio = t2u / max(t1u, 1e-3)
    decade = ratio ** (1.0 / math.log10(n)) if n > 1 else ratio
    c_base = t1u / max(t1c, 1e-3)
    c_now = t2u / max(t2c, 1e-3)
    widening = c_now / max(c_base, 1e-9)
    exceeded = decade > DECADE_BOUND
    widened = widening > WIDEN
    print(f"\ncontrast rule [{unc} / {cap}]:")
    print(f"  uncapped ratio {ratio:.2f}x over {n:g}x data -> "
          f"{decade:.1f}x/decade-equivalent (bound {DECADE_BOUND:g}x): "
          f"{'EXCEEDED' if exceeded else 'inside bound'}")
    print(f"  contrast {c_base:.2f} (base) -> {c_now:.2f} (now), widening "
          f"{widening:.2f}x (fire threshold {WIDEN:g}x): "
          f"{'WIDENED' if widened else 'flat'}")
    if exceeded and widened:
        print("  VERDICT: FIRED - kernel-origin growth confirmed by the "
              "control; port the df-cap (cap hot shingles' posting lists at "
              "df <= 64 before the pair walk) and keep the capped/uncapped "
              "pair inverted so the contrast survives (SCALING.md r10 #5)")
        return 2
    reason = ("slope inside the bound" if not exceeded else
              "contrast flat - shared infrastructure cost, not pair-walk "
              "growth; do not port the df-cap")
    print(f"  VERDICT: RE-ARMED ({reason})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
