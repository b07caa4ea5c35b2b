#!/usr/bin/env python3
"""Synthesize an N-times-larger copy of a fixture dir for scaling-slope
measurement (round-7 verdict item #2: prove sec(10x)/sec(1x) per entry,
not just plan shapes).

Each table is replicated N times with entity keys offset per replica by a
stride > max(key), so key cardinality, join fan-out and group counts all
scale by N (no artificial hot keys, no cross-replica key collisions):

- orders/lineitem/customer/supplier/part: all FK pairs offset consistently
  (replica k's lineitem joins replica k's orders/part/supplier only).
- events: event_id/user_id offset; ts/value untouched (same time span at
  N-times the event density - the "more traffic" scale direction).
- documents: doc_id offset; text passed through a per-replica AFFINE
  letter cipher i -> (a*i + b) mod 26 (length-preserving, so n_chars stays
  truthful; (a=1, b=k) for the first 26 replicas is exactly the former
  Caesar rotation, so fixtures with N <= 26 are bit-identical to the
  round-7 vintage). The cipher makes replica texts token-disjoint: two
  DISTINCT affine maps agree on at most one letter (a map is fixed by two
  points), so any token with >= 2 distinct letters can never render the
  same under two replicas - the near-dup cluster structure inside each
  replica is preserved EXACTLY while no cross-replica near-dups appear,
  and the LSH/dedup workload (pair count, cluster sizes) scales linearly
  by construction. A plain Caesar rotation has only 26 distinct maps, so
  N > 26 would alias replicas (k and k+26 identical) into N/26-sized
  duplicate clusters and an O(N^2) pair blow-up that measures the fixture,
  not the engine; affine supports N <= 312 (12 units x 26 shifts).
- embeddings: vec_id offset, labels copied, vectors passed through a
  per-replica-PAIR DIAGONAL +-1 ORTHOGONAL transform (deterministic sign
  flips; replicas 2j and 2j+1 share a pattern, pair 0 = identity): intra-
  replica dot products and norms are preserved bit-exactly, cross-PAIR
  cosines collapse far below any near-dup threshold, and each vector has
  exactly ONE exact-duplicate partner in its sibling replica — planted
  positives for the pair kernels at every scale (sf0.1's own vectors hold
  no >=0.999 pair), with candidate/result sets scaling as N/2 (linear).
  Plain copies (pre-r11) aliased every vector into an N-sized exact-
  duplicate cluster — an O(N^2) candidate blow-up that measured the
  fixture, not the engine (same reasoning as the affine cipher for
  documents).
- region/nation: copied unchanged (fixed-size dimensions at every scale).

Usage: python3 tools/make_scale_fixture.py [SRC_DIR] [DST_DIR] [N] [--docs-only|--events-only]
Defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10
--docs-only scales ONLY documents by N and copies every other table
unchanged - the cheap second-decade fixture for the documents-bound
dedup/index kernels (verdict r7 #4), where the relational tables' scale is
irrelevant but Bench still preloads them. --events-only likewise scales
ONLY events - the spot-measurement fixture for the streaming topologies
(verdict r11 #5), whose cost is events-bound; it also dodges the affine
cipher's N <= 312 ceiling (documents stay at 1x), so event scales beyond
300x stay buildable.
"""
import sys
import duckdb

docs_only = "--docs-only" in sys.argv
events_only = "--events-only" in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith("--")]
src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
dst = args[1] if len(args) > 1 else "/tmp/graft_sf1"
n = int(args[2]) if len(args) > 2 else 10

import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count() or 8}")


def stride(table, key):
    return con.sql(f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]


def emit(table, select_body, joins=""):
    q = (f"COPY (SELECT {select_body} FROM '{src}/{table}.parquet' "
         f"CROSS JOIN range({n}) r(k) {joins} ORDER BY k) "
         f"TO '{dst}/{table}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)")
    con.execute(q)
    rows = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {rows} rows")


assert not (docs_only and events_only), "pick one of --docs-only/--events-only"
full = not docs_only and not events_only
if docs_only:
    copy_unchanged = ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "embeddings")
elif events_only:
    copy_unchanged = ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "documents", "embeddings")
else:
    copy_unchanged = ("region", "nation")
for t in copy_unchanged:
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' "
                "(FORMAT PARQUET, COMPRESSION SNAPPY)")
    print(f"{t}: copied")

cust = stride("customer", "c_custkey")
supp = stride("supplier", "s_suppkey")
part = stride("part", "p_partkey")
orde = stride("orders", "o_orderkey")
evid = stride("events", "event_id")
user = stride("events", "user_id")
doc = stride("documents", "doc_id")
vec = stride("embeddings", "vec_id")

if full:
    emit("customer", f"c_custkey + k * {cust} AS c_custkey, c_name, c_nationkey, "
                     "c_acctbal, c_mktsegment")
    emit("supplier", f"s_suppkey + k * {supp} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    emit("part", f"p_partkey + k * {part} AS p_partkey, p_name, p_brand, p_type, "
                 "p_size, p_retailprice")
    emit("orders", f"o_orderkey + k * {orde} AS o_orderkey, o_custkey + k * {cust} AS o_custkey, "
                   "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    emit("lineitem", f"l_orderkey + k * {orde} AS l_orderkey, l_partkey + k * {part} AS l_partkey, "
                     f"l_suppkey + k * {supp} AS l_suppkey, l_linenumber, l_quantity, "
                     "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
    emit("events", f"event_id + k * {evid} AS event_id, ts, user_id + k * {user} AS user_id, "
                   "event_type, value, props")
if events_only:
    emit("events", f"event_id + k * {evid} AS event_id, ts, user_id + k * {user} AS user_id, "
                   "event_type, value, props")

# per-replica affine cipher: replica k maps letter i -> (a*i + b) mod 26,
# (a, b) drawn from units-of-26 x shifts. a=1 block first so replicas 0-25
# reproduce the former Caesar rotations bit-for-bit.
alpha = "abcdefghijklmnopqrstuvwxyz"
if full or docs_only:
    affine_pairs = [(a, b) for a in (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
                    for b in range(26)]
    assert n <= len(affine_pairs), f"affine family supports N <= {len(affine_pairs)}"

    def affine_alpha(a, b):
        return "".join(alpha[(a * i + b) % 26] for i in range(26))

    rot_cases = " ".join(
        f"WHEN k = {k} THEN translate(text, '{alpha}{alpha.upper()}', "
        f"'{affine_alpha(a, b)}{affine_alpha(a, b).upper()}')"
        for k, (a, b) in enumerate(affine_pairs[:n]))
    emit("documents", f"doc_id + k * {doc} AS doc_id, CASE {rot_cases} END AS text, "
                      "lang, source, n_chars")
def mix64(z):
    """SplitMix64 finalizer — a fixed, dependency-free bit mixer, so the
    sign patterns (and therefore fixture BYTES and the planted cross-pair
    structure) are reproducible on any Python/DuckDB version. The previous
    derivation used DuckDB's hash() builtin, whose output is an
    implementation detail free to change between DuckDB releases
    (ADVICE r11): a version bump would have silently produced a different
    fixture under the same _SUCCESS marker.
    """
    z = (z + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return (z ^ (z >> 31)) & 0xFFFFFFFFFFFFFFFF


# Per-MODE transform vintage (r12 ADVICE): bumped only when a transform
# the MODE actually applies changes. run_gates.sh matches the mode's token
# against the _SUCCESS marker and rebuilds stale fixtures — presence of
# _SUCCESS alone says nothing about the generator vintage that produced
# it (ADVICE r11). The r12a bump changed only the embeddings sign
# derivation, which --docs-only and --events-only copy UNCHANGED — their
# bytes have been identical since the affine-cipher/key-offset vintage
# (r11a), so an embeddings-side bump must not force a 100x docs rebuild
# whose output would be byte-identical.
TRANSFORM_VERSIONS = {"full": "r12a", "docs": "r11a", "events": "r11a"}
TRANSFORM_VERSION = TRANSFORM_VERSIONS[
    "docs" if docs_only else ("events" if events_only else "full")]

if full:
    # per-replica diagonal +-1 orthogonal transform (deterministic sign
    # flips; replica 0 = identity, so 1x-vintage bytes are preserved).
    # Sign flips keep every INTRA-replica dot product and norm BIT-EXACT
    # (each term a_i*b_i*s_i^2 = a_i*b_i, and -x is an exact IEEE op), so
    # the planted near-dup cluster structure inside each replica survives
    # untouched — while CROSS-replica cosines collapse toward 0, so no
    # cross-replica near-dups appear and pair counts scale linearly in N.
    # Plain vector copies (the pre-r11 behavior) gave every vector N-1
    # exact cross-replica duplicates: harmless for scan/top-k kernels (the
    # original comment's claim) but an O(N^2) pair blow-up for the
    # PAIR-GENERATION kernels (p05 within-bucket verify, p42 within-
    # cluster dedup) — 100 copies => C(100,2) self-pairs per vector, ~10^4
    # x the candidate set. This is the affine-cipher rationale, embeddings
    # edition: the fixture must not alias replicas into duplicate
    # clusters, or the gate measures the fixture instead of the engine.
    # Replica PAIRS (2j, 2j+1) share one sign pattern, so every vector has
    # exactly ONE exact-duplicate partner (cos = 1.0) in its sibling
    # replica: the planted positives the pair kernels must find exist at
    # EVERY scale (sf0.1's own 2000 vectors hold no >=0.999 pair, so
    # without this the kernels would return empty at 10x/100x), and the
    # candidate/result sets scale as N/2 — still linear.
    #
    # Sign bits come from mix64 (SplitMix64) on (pattern, dim), NOT from
    # DuckDB's hash() builtin — version-independent bytes. Multiplying by
    # the +-1.0 pattern value is the same exact IEEE op as the former
    # CASE-negation (sign-bit flip / identity; -0.0 handling identical).
    dim = con.sql(f"SELECT len(embedding) FROM '{src}/embeddings.parquet' "
                  "LIMIT 1").fetchone()[0]
    npat = (n - 1) // 2  # patterns for k >= 2 (p = k // 2 in 1..npat)
    con.execute("CREATE TEMP TABLE sign_pat(p BIGINT, sv DOUBLE[])")
    patterns = {0: [1.0] * dim}  # identity (k < 2), assertion-only
    for p in range(1, npat + 1):
        patterns[p] = [1.0 if mix64(p * 1000003 + d) & 1 == 0 else -1.0
                       for d in range(dim)]
        con.execute("INSERT INTO sign_pat VALUES (?, ?)", [p, patterns[p]])
    emit("embeddings",
         f"vec_id + k * {vec} AS vec_id, "
         "CASE WHEN k < 2 THEN embedding ELSE "
         "list_transform(embedding, (x, i) -> x * sv[i]) "
         "END AS embedding, label",
         joins="LEFT JOIN sign_pat ON sign_pat.p = k // 2")

    # Post-build structural assertion (ADVICE r11): the 'no cross-pair
    # near-dups' property is probabilistic — a base vector with its mass
    # concentrated on dimensions where two patterns agree could still
    # exceed the 0.999 kernel threshold. Check it EXACTLY for the one
    # structured risk: same-base cross-pattern cosines,
    # cos(v . s_p, v . s_q) = sum(x_i^2 s_p(i) s_q(i)) / sum(x_i^2), for
    # every base vector x every distinct pattern pair (identity included).
    # Different-base cross-replica pairs inherit the 1x fixture's own
    # no->=0.999-pair property plus independent sign scrambling; only the
    # same-base pairs carry planted structure worth proving.
    import numpy as np
    base = con.sql(f"SELECT embedding FROM '{src}/embeddings.parquet' "
                   "ORDER BY vec_id").fetchnumpy()["embedding"]
    X2 = np.stack([np.asarray(v, dtype=np.float64) ** 2 for v in base])
    X2 = X2 / X2.sum(axis=1, keepdims=True)          # rows sum to 1
    S = np.array([patterns[p] for p in sorted(patterns)])  # (npat+1, dim)
    pairs = [(a, b) for a in range(len(S)) for b in range(a + 1, len(S))]
    A = np.stack([S[a] * S[b] for a, b in pairs])    # (n_pairs, dim)
    worst = float(np.abs(X2 @ A.T).max()) if pairs else 0.0
    print(f"embeddings cross-pattern check: max |cos| = {worst:.4f} "
          f"over {len(base)} base vectors x {len(pairs)} pattern pairs")
    assert worst <= 0.99, (
        f"cross-pattern cosine {worst} exceeds 0.99 - a sign-pattern "
        "collision re-aliases replicas; pick a different mix constant")

# Done-marker, written LAST: a build that crashes partway (documents is
# written before embeddings) must not look complete to run_gates.sh's
# freshness check — presence of one parquet says nothing about the rest.
mode = "docs" if docs_only else ("events" if events_only else "full")
with open(f"{dst}/_SUCCESS", "w") as f:
    f.write(f"src={src} n={n} mode={mode} "
            f"transform={TRANSFORM_VERSION}\n")
print("done:", dst)
