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
- embeddings: vec_id offset, vectors/labels copied (ANN cost is driven by
  corpus size; duplicate points change nothing about the scan/bucket work).
- region/nation: copied unchanged (fixed-size dimensions at every scale).

Usage: python3 tools/make_scale_fixture.py [SRC_DIR] [DST_DIR] [N] [--docs-only]
Defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10
--docs-only scales ONLY documents by N and copies every other table
unchanged - the cheap second-decade fixture for the documents-bound
dedup/index kernels (verdict r7 #4), where the relational tables' scale is
irrelevant but Bench still preloads them.
"""
import sys
import duckdb

docs_only = "--docs-only" in sys.argv
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


def emit(table, select_body):
    q = (f"COPY (SELECT {select_body} FROM '{src}/{table}.parquet' "
         f"CROSS JOIN range({n}) r(k) ORDER BY k) "
         f"TO '{dst}/{table}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)")
    con.execute(q)
    rows = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {rows} rows")


copy_unchanged = ("region", "nation") if not docs_only else (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings")
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

if not docs_only:
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

# per-replica affine cipher: replica k maps letter i -> (a*i + b) mod 26,
# (a, b) drawn from units-of-26 x shifts. a=1 block first so replicas 0-25
# reproduce the former Caesar rotations bit-for-bit.
alpha = "abcdefghijklmnopqrstuvwxyz"
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
if not docs_only:
    emit("embeddings", f"vec_id + k * {vec} AS vec_id, embedding, label")

# Done-marker, written LAST: a build that crashes partway (documents is
# written before embeddings) must not look complete to run_gates.sh's
# freshness check — presence of one parquet says nothing about the rest.
with open(f"{dst}/_SUCCESS", "w") as f:
    f.write(f"src={src} n={n} docs_only={docs_only}\n")
print("done:", dst)
