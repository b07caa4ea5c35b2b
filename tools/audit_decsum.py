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
SCALE = {"p36_corpus_report": 9, "p70_pq_distortion": 12,
         # these two sum at DECIMAL(23,2) (cents scale) — envelope 2^53/100,
         # not /10^6 (q105's scale-6 qty column is tiny; q95 is price-only)
         "q105_aqe_skew_join": 2, "q95_group_by_all": 2}  # default 6
# Entries converted (r9) to the unscaled-BIGINT route (sum x 10^6 as
# BIGINT -> double): their envelope is 2^63 unscaled, i.e. |sum| < ~9.2e12.
# Probes for these measure the INTERNAL unscaled sums.
UNSCALED = {"q09_correlated_subquery", "q34_promo_revenue",
            "q70_tpch_q17_small_qty_revenue", "q76_tpch_q8_market_share",
            "q78_tpch_q14_promo_revenue"}
# q65's remaining per-supplier decimal->double cast no longer matches the
# SUM-cast regex (the sum is aliased before the cast since the r9 decimal
# threshold restructure) — force it into the audit with its probe.
FORCE = ["q65_tpch_q11_value_share"]

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
    # p70 scale-12 per-pair dot products: bounded by max self-dot
    "p70_pq_distortion": """
        SELECT max(s) FROM (
          SELECT vec_id, sum(abs(x * x)) AS s FROM (
            SELECT vec_id, unnest(embedding::DOUBLE[]) AS x
            FROM embeddings) GROUP BY vec_id)""",
}
PROBES["p22_kmeans_two_steps"] = PROBES["p20_kmeans_step"]

import duckdb
con = duckdb.connect()
con.execute("SET temp_directory='/root/repo/.tmp'")
con.execute(f"SET max_temp_directory_size='{os.environ.get('GRAFT_DUCK_TEMP_CAP', '60GiB')}'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
pat = re.compile(r"AS DECIMAL\((?:23,6|23,2|18,9|38,12)\)\)\) AS DOUBLE\)", re.I)
pat_uns = re.compile(r"\* 1000000\s+AS BIGINT", re.I)
entries = sorted(set(k for k in oracles
                     if pat.search(oracles[k]) or pat_uns.search(oracles[k]))
                 | set(FORCE))

rows, flagged = [], []
for name in entries:
    scale = SCALE.get(name, 6)
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
