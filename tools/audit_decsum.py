#!/usr/bin/env python3
"""decSum headroom audit (verdict r8 item #5): measure, per gate entry that
casts an exact decimal sum to DOUBLE, the maximum |group sum| the cast sees
at a given fixture, against the cast's exactness envelope (unscaled value
< 2^53, i.e. |sum| < 2^53 / 10^scale). q03 proved the failure mode is real:
group sums ~2.8e10 at the 10x fixture made the decimal->double cast round
differently between engines (1 ulp) and fail the driver hash.

Two measurement classes:
- SUM entries emit the cast sum itself: run the entry's oracle SQL at the
  fixture and take max |value| over DOUBLE output columns — the exact
  magnitudes every gate-facing cast produced.
- RATIO entries bury the cast sums inside a division (promo share, value
  threshold, mean): a hand-written probe per entry measures the internal
  |group sum| at the same fixture (upper bounds where the exact filter is
  correlated; noted inline).

Output: a markdown headroom table (entry, max |sum|, envelope, headroom x)
ready for SCALING.md, and a non-zero exit listing entries inside the
flag threshold (default 100x — "two orders of magnitude" per the verdict).

Usage: python3 tools/audit_decsum.py [sfDir=/tmp/graft_sf1] [--flag=100]
Reads oracle SQL from GRAFT_VERIFY_OUT (default /tmp/verify_out), which
must hold a current oracle_sql.json (any prior Verify run).
"""
import json, os, re, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = args[0] if args else "/tmp/graft_sf1"
FLAG = 100.0
for a in sys.argv[1:]:
    if a.startswith("--flag="):
        FLAG = float(a[len("--flag="):])
OUT = os.environ.get("GRAFT_VERIFY_OUT", "/tmp/verify_out")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ENV53 = float(2 ** 53)
ENV63 = float(2 ** 63)
# Per-entry scale is DERIVED from the oracle's own cast text (the generic
# regexes below capture (precision, scale); the tightest envelope — the
# largest captured scale — governs). SCALE overrides entries whose oracle
# mixes scales such that the max-|output| column belongs to the SMALLER
# scale's cast (pairing max output with the max scale would be wrong).
SCALE = {
    # q105 sums revenue at DECIMAL(23,2) (cents — the 1.8e11 output column,
    # envelope 9e13); its scale-6 cast is the tiny per-bucket qty average
    # (r9 classification, SCALING.md). Derived max-scale would mis-pair.
    "q105_aqe_skew_join": 2,
}
# Entries converted (r9) to the unscaled-BIGINT route (sum x 10^6 as
# BIGINT -> double): their envelope is 2^63 unscaled, i.e. |sum| < ~9.2e12.
# Probes for these measure the INTERNAL unscaled sums.
UNSCALED = {"q09_correlated_subquery", "q34_promo_revenue",
            "q70_tpch_q17_small_qty_revenue", "q76_tpch_q8_market_share",
            "q78_tpch_q14_promo_revenue"}
# q65's remaining per-supplier decimal->double cast no longer matches the
# SUM-cast regex (the sum is aliased before the cast since the r9 decimal
# threshold restructure) — force it into the audit with its probe.
# q62's cast is a WINDOW running sum (matched by pat_win below, measured by
# probe: the per-custkey total bounds every prefix of positive addends).
FORCE = ["q65_tpch_q11_value_share", "q62_window_rows_frame",
         "q13_window_range_frame"]

# Internal-sum probes for the entries whose decimal->double casts feed a
# division or comparison rather than the output column. Each returns ONE
# value: the max |sum| (or a stated upper bound) the cast sees.
PROBES = {
    # global promo-window revenue sums (numerator <= denominator)
    "q34_promo_revenue": """
        SELECT abs(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(23,6))))
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'""",
    "q78_tpch_q14_promo_revenue": """
        SELECT abs(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(23,6))))
        FROM lineitem l, part p
        WHERE l.l_partkey = p.p_partkey
          AND l.l_shipdate >= TIMESTAMP '1997-09-01'
          AND l.l_shipdate <  TIMESTAMP '1997-10-01'""",
    # Q11 post-r9: the global threshold compares DECIMALS (exact at any
    # magnitude); the remaining double cast is the per-supplier value
    "q65_tpch_q11_value_share": """
        SELECT max(abs(s)) FROM (
          SELECT SUM(CAST(l.l_extendedprice AS DECIMAL(23,6))) AS s
          FROM lineitem l, supplier s, nation n, region r
          WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
            AND n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
          GROUP BY l.l_suppkey)""",
    # Q22 post-r9: the global avg threshold runs unscaled (13000x headroom
    # at 2^63); the remaining double casts are the per-country output sums
    # (upper bound: per-nation positive-balance sum over ALL customers)
    "q69_tpch_q22_lost_customers": """
        SELECT max(abs(s)) FROM (
          SELECT SUM(CAST(c_acctbal AS DECIMAL(23,6))) AS s
          FROM customer WHERE c_acctbal > 0.0 GROUP BY c_nationkey)""",
    # Q17: upper bound — brand sum WITHOUT the correlated qty filter
    "q70_tpch_q17_small_qty_revenue": """
        SELECT abs(SUM(CAST(l.l_extendedprice AS DECIMAL(23,6))))
        FROM lineitem l, part p
        WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#4'""",
    # q09: exact internal sum (the correlated filter replayed)
    "q09_correlated_subquery": """
        SELECT abs(SUM(CAST(l_extendedprice AS DECIMAL(23,6))))
        FROM lineitem
        WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)""",
    # q62/q13: windowed running sums of o_totalprice per custkey — every
    # frame of an all-positive series is bounded by the full per-key total
    "q62_window_rows_frame": """
        SELECT max(s) FROM (
          SELECT SUM(CAST(o_totalprice AS DECIMAL(23,6))) AS s
          FROM orders GROUP BY o_custkey)""",
    # Q20: max per-(part,supp) quantity sum (both cast sites share it)
    "q72_tpch_q20_part_promotion": """
        SELECT max(abs(s)) FROM (
          SELECT SUM(CAST(l_quantity AS DECIMAL(23,6))) AS s
          FROM lineitem GROUP BY l_partkey, l_suppkey)""",
    # Q8: per-year denominator volume (n2 supplier-nation lookup dropped —
    # 1:1, row multiplicity unchanged)
    "q76_tpch_q8_market_share": """
        SELECT max(abs(s)) FROM (
          SELECT year(o.o_orderdate) AS y,
                 SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(23,6))) AS s
          FROM part p, supplier s2, lineitem l, orders o, customer c,
               nation n1, region r
          WHERE p.p_partkey = l.l_partkey AND s2.s_suppkey = l.l_suppkey
            AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
            AND c.c_nationkey = n1.n_nationkey
            AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
          GROUP BY 1)""",
    # p36 mean_quality: scale-9 sum bounded by docs-per-source (score <= 1);
    # upper bound = max per-source count * 1.0
    "p36_corpus_report": """
        SELECT max(cnt)::DOUBLE FROM (
          SELECT count(*) AS cnt FROM documents GROUP BY source)""",
    # p20/p22 centroid components: per-(part,pos) sum bounded by the
    # assignment-independent per-pos sum of |x| over the planted corpus
    # (base + 30% planted variants, factor 1.3 applied)
    "p20_kmeans_step": """
        SELECT 1.3 * max(s) FROM (
          SELECT pos, sum(abs(x)) AS s FROM (
            SELECT unnest(embedding::DOUBLE[]) AS x,
                   generate_subscripts(embedding::DOUBLE[], 1) AS pos
            FROM embeddings) GROUP BY pos)""",
    # p47's normalizer: the exact sum the DECIMAL(28,12)-quantized sqrt
    # weights cast sees (one weight per language, each <= 1)
    "p47_temperature_resampling": """
        SELECT CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) FROM (
          SELECT sqrt(CAST(sum(n_chars) AS DOUBLE) /
                      (SELECT sum(n_chars) FROM documents)) AS w
          FROM documents GROUP BY lang)""",
}
PROBES["p22_kmeans_two_steps"] = PROBES["p20_kmeans_step"]
PROBES["q13_window_range_frame"] = PROBES["q62_window_rows_frame"]

import duckdb
con = duckdb.connect()
con.execute("SET temp_directory='/root/repo/.tmp'")
con.execute(f"SET max_temp_directory_size='{os.environ.get('GRAFT_DUCK_TEMP_CAP', '60GiB')}'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
# GENERIC cast-site discovery (ADVICE r9): match decimal-sum-to-double
# shapes structurally and derive the envelope from the CAPTURED scale, so a
# new precision or a restructured entry can't silently drop out of the
# audit. Four recognized shapes:
#   output  CAST(SUM(CAST(e AS DECIMAL(p,s))) [FILTER (WHERE ..)] AS DOUBLE)
#   window  CAST(SUM(CAST(e AS DECIMAL(p,s))) OVER w AS DOUBLE)   [probe]
#   uns     CAST(CAST(SUM(..) * 1000000 AS BIGINT) .. AS DOUBLE)  [2^63]
#   dot     (SELECT sum(CAST(x*y AS DECIMAL(38,12))) FROM unnest..) AS DOUBLE
# The dot class is a FIXED-LENGTH (64-term) per-pair product sum, bounded
# for every entry by the corpus max self-dot (Cauchy-Schwarz: |a.b| <=
# sqrt(a.a * b.b) <= max self-dot) — one shared probe, scale 12.
pat = re.compile(
    r"AS DECIMAL\((\d+),(\d+)\)\)\)\s*(?:FILTER \(WHERE [^)]*\)\s*)?AS DOUBLE\)",
    re.I)
# the OVER clause is a named window or an inline spec (one paren nesting
# level covers epoch()/year() calls inside the spec)
pat_win = re.compile(
    r"AS DECIMAL\((\d+),(\d+)\)\)\)\s*OVER\s*(?:\w+|\((?:[^()]|\([^()]*\))*\))\s*AS DOUBLE\)",
    re.I)
pat_uns = re.compile(r"\* 1000000\s+AS BIGINT", re.I)
pat_dot = re.compile(r"AS DECIMAL\(38,\s*12\)\)\)\s*FROM \(SELECT unnest", re.I)
DOT_PROBE = """
    SELECT max(s) FROM (
      SELECT vec_id, sum(abs(x * x)) AS s FROM (
        SELECT vec_id, unnest(embedding::DOUBLE[]) AS x
        FROM embeddings) GROUP BY vec_id)"""

# tripwire: ANY 'AS DOUBLE' whose preceding context contains a decimal SUM
# but which matches no recognized shape means a cast site the audit can't
# classify — fail loudly rather than silently skip it (this tripwire's
# first run found four shape classes the r9 alternation-regex never saw).
# Each 'AS DOUBLE' is classified INDIVIDUALLY (ADVICE r10): a recognized
# cast that merely appears EARLIER in the 200-char window must not satisfy
# the search for the cast under test, or an adjacent unrecognized
# decimal-sum cast is masked (false negative). Two anchor rules:
#   - output/window shapes end in 'AS DOUBLE)': the match must END at the
#     window's end, i.e. classify THIS cast, not a neighbor's;
#   - marker shapes (uns/dot) tag the nearest ENCLOSING conversion: the
#     marker must occur after any earlier 'AS DOUBLE' in the window, else
#     it belongs to a previous (separately classified) cast.
pat_trip = re.compile(r"AS\s+DOUBLE", re.I)


def classified(ctx):
    if any(mm.end() == len(ctx) for p in (pat, pat_win)
           for mm in p.finditer(ctx)):
        return True
    cur_end = len(ctx) - 1  # current match ends at len(ctx)-1 (+1 char)
    prev_end = max((t.end() for t in pat_trip.finditer(ctx)
                    if t.end() < cur_end), default=0)
    return any(mm.start() >= prev_end for p in (pat_uns, pat_dot)
               for mm in p.finditer(ctx))


unrecognized = []
for k, sql in oracles.items():
    for m in pat_trip.finditer(sql):
        ctx = sql[max(0, m.start() - 200):m.end() + 1]
        if "DECIMAL(" in ctx.upper() and "SUM(" in ctx.upper() \
                and not classified(ctx) \
                and k not in FORCE and k not in PROBES:
            unrecognized.append((k, ctx[-100:].replace("\n", " ")))
if unrecognized:
    for k, ctx in unrecognized:
        print(f"UNRECOGNIZED decimal-sum->double cast in {k}: ...{ctx}")
    print("audit_decsum: add a probe/FORCE entry or extend the pattern")
    sys.exit(1)

# scale derivation uses the output + window classes only — dot-class casts
# are audited separately below (a mixed oracle like p20 has scale-12 dot
# norms AND a scale-6 centroid mean; pairing the centroid probe with the
# dot envelope under-reports headroom by 10^6)
derived_scale = {}
for k in oracles:
    caps = [int(s) for _, s in pat.findall(oracles[k])] \
         + [int(s) for _, s in pat_win.findall(oracles[k])]
    if caps:
        derived_scale[k] = max(caps)
dot_entries = sorted(k for k in oracles if pat_dot.search(oracles[k]))
entries = sorted(set(k for k in oracles
                     if pat.search(oracles[k]) or pat_win.search(oracles[k])
                     or pat_uns.search(oracles[k]))
                 | set(FORCE))

rows, flagged = [], []
for name in entries:
    scale = SCALE.get(name, derived_scale.get(name, 6))
    # an entry on the unscaled route is bounded by 2^63 unscaled unless it
    # ALSO retains a decimal->double SUM cast (then the tighter 2^53 class
    # governs and the probe measures that remnant)
    if name in UNSCALED:
        envelope = ENV63 / 10 ** 6
    else:
        envelope = ENV53 / 10 ** scale
    try:
        if name in PROBES:
            v = con.sql(PROBES[name]).fetchone()[0]
            mx = float(v or 0.0)
            kind = "probe"
        else:
            rel = con.sql(oracles[name])
            dbl_idx = [i for i, t in enumerate(rel.types) if str(t) == "DOUBLE"]
            mx = 0.0
            for r in rel.fetchall():
                for i in dbl_idx:
                    if r[i] is not None:
                        mx = max(mx, abs(float(r[i])))
            kind = "output"
    except Exception as e:
        rows.append((name, "ERROR", str(e)[:80], "", ""))
        flagged.append(name)
        continue
    head = envelope / mx if mx > 0 else float("inf")
    rows.append((name, kind, f"{mx:.3e}", f"{envelope:.1e}", f"{head:,.0f}x"))
    if head < FLAG:
        flagged.append(name)

# dot class: one shared measurement (max self-dot bounds every pairwise
# dot by Cauchy-Schwarz) against the scale-12 envelope, covering all
# entries whose only 38,12 casts are fixed-length embedding products
if dot_entries:
    try:
        v = float(con.sql(DOT_PROBE).fetchone()[0] or 0.0)
        env_dot = ENV53 / 10 ** 12
        head = env_dot / v if v > 0 else float("inf")
        rows.append((f"[dot x{len(dot_entries)}] " + ",".join(
            e.split("_")[0] for e in dot_entries), "probe",
            f"{v:.3e}", f"{env_dot:.1e}", f"{head:,.0f}x"))
        if head < FLAG:
            flagged.extend(dot_entries)
    except Exception as e:
        rows.append(("[dot]", "ERROR", str(e)[:80], "", ""))
        flagged.extend(dot_entries)

print(f"decSum headroom at {SF_DIR} (envelope = 2^53 / 10^scale):\n")
print("| entry | how | max abs sum | envelope | headroom |")
print("|---|---|---|---|---|")
for r in rows:
    print("| " + " | ".join(str(x) for x in r) + " |")
print(f"\n{len(entries)} entries audited; flag threshold {FLAG:.0f}x")
if flagged:
    print("INSIDE THRESHOLD (convert to the q03 string / unscaled-ratio "
          f"pattern): {flagged}")
sys.exit(1 if flagged else 0)
