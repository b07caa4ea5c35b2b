#!/usr/bin/env python3
"""Differential SQL fuzzer: generate random aggregation queries in the
(type-parity discipline: rank-family window functions and year()/month()
are CAST to BIGINT — Spark types them INTEGER, DuckDB BIGINT — matching
the registry's own BIGINT casts; the harness compares types since r6.)
Spark∩DuckDB dialect, run them through graft.RunSql (Spark) and DuckDB,
compare exactly. Determinism rules: only exact aggregates (count/min/max,
integer sums, avg-of-int = one exact division), categorical group keys,
total ORDER BY. Usage:
    python3 tools/fuzz_oracle.py [sfDir] [nQueries] [seed]
"""
import json, random, subprocess, sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 60
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 42
OUT = "/tmp/fuzz_out"
QFILE = "/tmp/fuzz_queries.json"

rng = random.Random(SEED)

TABLES = {
    "lineitem": {
        "group": ["l_returnflag", "l_linestatus", "l_linenumber"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "double": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "str": ["l_returnflag", "l_linestatus"],
        "predcols": [("l_orderkey", "int", (1, 60000)), ("l_quantity", "num", (1, 50)),
                     ("l_returnflag", "str", ["A", "N", "R"]), ("l_discount", "num", (0, 0.1))],
    },
    "orders": {
        "group": ["o_orderstatus", "o_orderpriority", "CAST(year(o_orderdate) AS BIGINT)"],
        "int": ["o_orderkey", "o_custkey"],
        "double": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "predcols": [("o_custkey", "int", (1, 15000)), ("o_totalprice", "num", (1000, 400000)),
                     ("o_orderstatus", "str", ["F", "O", "P"])],
    },
    "events": {
        "group": ["event_type", "user_id % 10"],
        "int": ["event_id", "user_id"],
        "double": ["value"],
        "str": ["event_type", "props"],
        "predcols": [("user_id", "int", (0, 1000)), ("value", "num", (0, 200)),
                     ("event_type", "str", ["click", "view", "purchase", "error", "signup"])],
    },
}


def gen_pred(t):
    col, kind, dom = rng.choice(TABLES[t]["predcols"])
    if kind == "int":
        op = rng.choice(["<", "<=", ">", ">=", "="])
        return f"{col} {op} {rng.randint(*dom)}"
    if kind == "num":
        op = rng.choice(["<", "<=", ">", ">="])
        return f"{col} {op} {round(rng.uniform(*dom), 2)}"
    vals = rng.sample(dom, k=rng.randint(1, len(dom)))
    if len(vals) == 1:
        return f"{col} = '{vals[0]}'"
    return f"{col} IN ({', '.join(repr(v) for v in vals)})"


JOINS = [
    # (sql_from, usable group cols, usable agg cols by kind, pred tables)
    ("lineitem JOIN orders ON l_orderkey = o_orderkey",
     ["l_returnflag", "o_orderstatus", "o_orderpriority", "CAST(year(o_orderdate) AS BIGINT)"],
     {"int": ["l_partkey", "o_custkey"], "double": ["l_quantity", "o_totalprice"],
      "str": ["l_linestatus", "o_orderpriority"]},
     ["lineitem", "orders"]),
    ("orders JOIN customer ON o_custkey = c_custkey",
     ["o_orderstatus", "c_mktsegment"],
     {"int": ["o_orderkey", "c_nationkey"], "double": ["o_totalprice", "c_acctbal"],
      "str": ["o_orderpriority", "c_mktsegment"]},
     ["orders"]),
]


def gen_join_query(i):
    frm, groups_all, cols, predtables = rng.choice(JOINS)
    groups = rng.sample(groups_all, k=rng.randint(1, 2))
    aggs = ["count(*) AS cnt"]
    for j in range(rng.randint(1, 3)):
        kind = rng.choice(["minmax_int", "minmax_double", "minmax_str", "sum_int"])
        if kind == "sum_int":
            aggs.append(f"CAST(sum({rng.choice(cols['int'])}) AS BIGINT) AS a{j}")
        else:
            fam = {"minmax_int": "int", "minmax_double": "double", "minmax_str": "str"}[kind]
            aggs.append(f"{rng.choice(['min', 'max'])}({rng.choice(cols[fam])}) AS a{j}")
    where = ""
    if rng.random() < 0.7:
        preds = [gen_pred(rng.choice(predtables)) for _ in range(rng.randint(1, 2))]
        where = " WHERE " + rng.choice([" AND ", " OR "]).join(preds)
    gsel = [f"{g} AS g{k}" for k, g in enumerate(groups)]
    gnames = [f"g{k}" for k in range(len(groups))]
    return (f"j{i:03d}",
            f"SELECT {', '.join(gsel + aggs)} FROM {frm}{where} "
            f"GROUP BY {', '.join(groups)} ORDER BY {', '.join(gnames)}")


# NULL-KEY join shapes — the q57-class traps where Spark and DuckDB can
# silently diverge: outer joins whose keys are genuinely NULL on both
# sides (equality never matches NULL; null-safe comparison does), and the
# padding rows a LEFT/FULL join synthesizes. Keys are nullif(key % m, 0)
# so every branch carries a controlled fraction of NULLs; branches are
# key-bounded so FULL joins stay small. Row-set compare (the harness
# sorts) keeps outer-join row order out of the verdict.
NULLJOIN_SHAPES = [
    # (table, key, payload_int, bound_pred)
    ("lineitem", "l_orderkey", "l_partkey", "l_orderkey <= 4000"),
    ("orders", "o_orderkey", "o_custkey", "o_orderkey <= 4000"),
    ("events", "event_id", "user_id", "event_id <= 3000"),
]


def gen_nulljoin_query(i):
    at, ak, av, abound = rng.choice(NULLJOIN_SHAPES)
    bt, bk, bv, bbound = rng.choice(NULLJOIN_SHAPES)
    m = rng.randint(3, 9)
    a = (f"(SELECT nullif({ak} % {m}, 0) AS k, "
         f"CAST(sum({av}) AS BIGINT) AS av FROM {at} WHERE {abound} GROUP BY 1)")
    b = (f"(SELECT nullif({bk} % {m}, 0) AS k, "
         f"CAST(sum({bv}) AS BIGINT) AS bv FROM {bt} WHERE {bbound} GROUP BY 1)")
    jt = rng.choice(["JOIN", "LEFT JOIN", "FULL JOIN"])
    cond = rng.choice(["a.k = b.k", "a.k IS NOT DISTINCT FROM b.k"])
    return (f"o{i:03d}",
            f"SELECT a.k AS ka, b.k AS kb, a.av AS a0, b.bv AS a1 "
            f"FROM {a} a {jt} {b} b ON {cond}")


def gen_notin_query(i):
    # [NOT] IN (subquery with NULLs): a NULL in a NOT IN list makes every
    # comparison UNKNOWN, so the standard answer is the empty set — the
    # null-semantics cliff both engines must fall off identically. The
    # nullable branch is coin-flipped so roughly half the queries keep a
    # non-degenerate NOT IN.
    o_t, o_key, o_col, i_t, i_key, i_col, i_vals = rng.choice(EXISTS_SHAPES)
    neg = rng.choice(["IN", "NOT IN"])
    if rng.random() < 0.5:
        sub_expr = f"nullif({i_key} % {rng.randint(3, 9)}, 0)"
        out_expr = f"{o_key} % 7"
    else:
        sub_expr = i_key
        out_expr = o_key
    pred = ""
    if rng.random() < 0.7:
        vals = rng.sample(i_vals, k=rng.randint(1, len(i_vals) - 1))
        pred = (f" WHERE {i_col} IN ({', '.join(repr(v) for v in vals)})"
                if len(vals) > 1 else f" WHERE {i_col} = '{vals[0]}'")
    return (f"i{i:03d}",
            f"SELECT {o_key} AS k, {o_col} AS a0 FROM {o_t} "
            f"WHERE {out_expr} {neg} (SELECT {sub_expr} FROM {i_t}{pred}) "
            f"ORDER BY k")


# windows are deterministic when ordered by a unique key within partition
WINDOW_TABLES = {
    "orders": {"part": ["o_orderstatus", "o_orderpriority"], "ukey": "o_orderkey",
               "int": ["o_custkey"], "val": ["o_totalprice"]},
    "events": {"part": ["event_type", "user_id % 10"], "ukey": "event_id",
               "int": ["user_id"], "val": ["value"]},
}


def gen_window_query(i):
    t = rng.choice(list(WINDOW_TABLES))
    spec = WINDOW_TABLES[t]
    part = rng.choice(spec["part"])
    ukey = spec["ukey"]
    win = f"PARTITION BY {part} ORDER BY {ukey}"
    sels = [f"{part} AS g0", f"{ukey} AS k",
            f"CAST(row_number() OVER ({win}) AS BIGINT) AS rn"]
    for j, kind in enumerate(rng.sample(
            ["rank", "lag", "lead", "runsum", "firstval"], k=rng.randint(1, 3))):
        if kind == "rank":
            sels.append(f"CAST(dense_rank() OVER ({win}) AS BIGINT) AS a{j}")
        elif kind == "lag":
            sels.append(f"lag({rng.choice(spec['val'])}, 1) OVER ({win}) AS a{j}")
        elif kind == "lead":
            sels.append(f"lead({ukey}, 1) OVER ({win}) AS a{j}")
        elif kind == "runsum":
            c = rng.choice(spec["int"])
            sels.append(f"CAST(sum({c}) OVER ({win} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS a{j}")
        else:
            sels.append(f"first_value({ukey}) OVER ({win}) AS a{j}")
    where = f" WHERE {gen_pred(t)}" if rng.random() < 0.6 else ""
    return (f"w{i:03d}",
            f"SELECT * FROM (SELECT {', '.join(sels)} FROM {t}{where}) "
            f"WHERE rn <= 10 ORDER BY g0, rn")


# explicit window FRAMES — sliding ROWS, value-based RANGE, ntile,
# nth_value. Determinism rules: ORDER BY the unique key so ROWS frame
# membership is well-defined; frame sums are integer-only (a sliding
# DOUBLE sum's association order is engine-specific: segment trees vs
# running accumulation); RANGE bounds are integer offsets on the key.
def gen_frame_query(i):
    t = rng.choice(list(WINDOW_TABLES))
    spec = WINDOW_TABLES[t]
    part = rng.choice(spec["part"])
    ukey = spec["ukey"]
    win = f"PARTITION BY {part} ORDER BY {ukey}"
    sels = [f"{part} AS g0", f"{ukey} AS k"]
    for j in range(rng.randint(1, 3)):
        kind = rng.choice(["rows_sum", "rows_minmax", "range_cnt", "range_minmax",
                           "ntile", "nth"])
        if kind == "rows_sum":
            a, b = rng.randint(0, 5), rng.randint(0, 5)
            c = rng.choice(spec["int"])
            sels.append(f"CAST(sum({c}) OVER ({win} ROWS BETWEEN {a} PRECEDING "
                        f"AND {b} FOLLOWING) AS BIGINT) AS a{j}")
        elif kind == "rows_minmax":
            a = rng.randint(1, 8)
            c = rng.choice(spec["val"])
            f = rng.choice(["min", "max"])
            sels.append(f"{f}({c}) OVER ({win} ROWS BETWEEN {a} PRECEDING "
                        f"AND CURRENT ROW) AS a{j}")
        elif kind == "range_cnt":
            w = rng.randint(1, 2000)
            sels.append(f"CAST(count(*) OVER ({win} RANGE BETWEEN {w} PRECEDING "
                        f"AND CURRENT ROW) AS BIGINT) AS a{j}")
        elif kind == "range_minmax":
            w = rng.randint(1, 2000)
            c = rng.choice(spec["int"])
            f = rng.choice(["min", "max"])
            sels.append(f"{f}({c}) OVER ({win} RANGE BETWEEN CURRENT ROW "
                        f"AND {w} FOLLOWING) AS a{j}")
        elif kind == "ntile":
            sels.append(f"CAST(ntile({rng.randint(2, 7)}) OVER ({win}) AS BIGINT) AS a{j}")
        else:
            c = rng.choice(spec["val"])
            sels.append(f"nth_value({c}, {rng.randint(1, 4)}) OVER ({win} "
                        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a{j}")
    where = f" WHERE {gen_pred(t)}" if rng.random() < 0.6 else ""
    return (f"r{i:03d}",
            f"SELECT * FROM (SELECT {', '.join(sels)}, "
            f"CAST(row_number() OVER ({win}) AS BIGINT) AS rn FROM {t}{where}) "
            f"WHERE rn <= 12 ORDER BY g0, rn")


SCALARS = {
    "part": {"key": "p_partkey", "str": ["p_name", "p_brand", "p_type"],
             "num": ["p_retailprice", "p_size"], "date": []},
    "orders": {"key": "o_orderkey", "str": ["o_orderpriority", "o_orderstatus"],
               "num": ["o_totalprice"], "date": ["o_orderdate"]},
}


def gen_scalar_query(i):
    t = rng.choice(list(SCALARS))
    spec = SCALARS[t]
    key = spec["key"]
    sels = [f"{key} AS k"]
    for j in range(rng.randint(2, 4)):
        kind = rng.choice(
            ["upper", "lower", "substr", "length", "concat", "abs", "floor", "round2"]
            + (["year", "month", "quarter", "lastday", "dtrunc"]
               if spec["date"] else []))
        if kind in ("upper", "lower"):
            sels.append(f"{kind}({rng.choice(spec['str'])}) AS a{j}")
        elif kind == "substr":
            sels.append(f"substring({rng.choice(spec['str'])}, {rng.randint(1, 3)}, {rng.randint(2, 6)}) AS a{j}")
        elif kind == "length":
            sels.append(f"CAST(length({rng.choice(spec['str'])}) AS BIGINT) AS a{j}")
        elif kind == "concat":
            a, b = rng.choice(spec["str"]), rng.choice(spec["str"])
            sels.append(f"concat({a}, '|', {b}) AS a{j}")
        elif kind == "abs":
            sels.append(f"abs({rng.choice(spec['num'])} - {rng.randint(1, 100)}) AS a{j}")
        elif kind == "floor":
            sels.append(f"CAST(floor({rng.choice(spec['num'])}) AS BIGINT) AS a{j}")
        elif kind == "round2":
            # round(double, 2): both engines round-half-even on the exact
            # binary value? NOT portable in general — use floor of scaled
            sels.append(f"CAST(floor({rng.choice(spec['num'])} * 4) AS BIGINT) AS a{j}")
        elif kind == "year":
            sels.append(f"CAST(year({rng.choice(spec['date'])}) AS BIGINT) AS a{j}")
        elif kind == "quarter":
            sels.append(f"CAST(quarter({rng.choice(spec['date'])}) AS BIGINT) AS a{j}")
        elif kind == "lastday":
            # month-end snap: DATE in both dialects
            sels.append(f"last_day({rng.choice(spec['date'])}) AS a{j}")
        elif kind == "dtrunc":
            # Spark date_trunc returns TIMESTAMP, DuckDB returns DATE —
            # the explicit CAST AS DATE makes the shared text type-stable
            part = rng.choice(["year", "month"])
            sels.append(f"CAST(date_trunc('{part}', {rng.choice(spec['date'])}) AS DATE) AS a{j}")
        else:
            sels.append(f"CAST(month({rng.choice(spec['date'])}) AS BIGINT) AS a{j}")
    return (f"s{i:03d}",
            f"SELECT {', '.join(sels)} FROM {t} WHERE {key} <= 500 ORDER BY k")


def gen_setop_query(i):
    # two branches over one table with different predicates, combined with a
    # set operator; deterministic because the row SET is compared (the
    # harness sorts rows itself)
    t = rng.choice(["lineitem", "orders", "events"])
    spec = TABLES[t]
    keys = rng.sample(spec["group"], k=rng.randint(1, 2))
    proj = ", ".join(f"{c} AS c{k}" for k, c in enumerate(keys))
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
                     "INTERSECT ALL", "EXCEPT ALL"])
    def branch():
        return f"SELECT {proj} FROM {t} WHERE {gen_pred(t)}"
    cnames = ", ".join(f"c{k}" for k in range(len(keys)))
    return (f"u{i:03d}",
            f"SELECT * FROM ({branch()} {op} {branch()}) ORDER BY {cnames}")


def gen_grouping_query(i):
    # rollup / cube / grouping sets — null-extended group keys must match
    # across engines (row-set comparison, so null-ordering dialects differ
    # harmlessly)
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    groups = rng.sample(spec["group"], k=2)
    shape = rng.choice([
        f"ROLLUP ({groups[0]}, {groups[1]})",
        f"CUBE ({groups[0]}, {groups[1]})",
        f"GROUPING SETS (({groups[0]}), ({groups[1]}), ())"])
    aggs = ["count(*) AS cnt",
            f"CAST(sum({rng.choice(spec['int'])}) AS BIGINT) AS a0",
            f"{rng.choice(['min', 'max'])}({rng.choice(spec['str'])}) AS a1"]
    where = f" WHERE {gen_pred(t)}" if rng.random() < 0.6 else ""
    gsel = [f"{g} AS g{k}" for k, g in enumerate(groups)]
    # Cross-engine divergence found by this fuzzer (seed 9999 sf0.001): on
    # EMPTY input the grand-total grouping set `()` (also implied by
    # ROLLUP/CUBE) yields one count=0 row in DuckDB/Postgres (SQL standard)
    # but ZERO rows in stock Spark. graft.plans.StandardGroupingSets now
    # restores the standard row (RunSql turns the flag on), so the queries
    # run UN-normalized — every generated shape exercises the rule.
    return (f"g{i:03d}",
            f"SELECT {', '.join(gsel + aggs)} FROM {t}{where} GROUP BY {shape}")


# argmax determinism: the ORDER argument must be a unique column, so
# max_by/min_by pick one well-defined row in both engines
ARGMAX_TABLES = {
    "events": {"key": ["user_id % 10", "event_type"], "uniq": "event_id",
               "val": ["value", "user_id", "event_type", "ts"]},
    "orders": {"key": ["o_orderstatus", "o_orderpriority"], "uniq": "o_orderkey",
               "val": ["o_totalprice", "o_custkey", "o_orderdate"]},
}


def gen_argmax_query(i):
    # max_by/min_by (Spark) == max_by/min_by (DuckDB alias of arg_max) —
    # the latest-by-key / CDC-snapshot shape (q51) randomized
    t = rng.choice(list(ARGMAX_TABLES))
    spec = ARGMAX_TABLES[t]
    key = rng.choice(spec["key"])
    sels = [f"{key} AS g0", "count(*) AS cnt"]
    for j in range(rng.randint(1, 3)):
        fn = rng.choice(["max_by", "min_by"])
        sels.append(f"{fn}({rng.choice(spec['val'])}, {spec['uniq']}) AS a{j}")
    where = f" WHERE {gen_pred(t)}" if rng.random() < 0.6 else ""
    return (f"x{i:03d}",
            f"SELECT {', '.join(sels)} FROM {t}{where} GROUP BY {key} ORDER BY g0")


# correlated EXISTS / NOT EXISTS on a key — randomized semi/anti join
# shapes (the q67/q69 plan families). Deterministic: row-set compare, and
# the correlated subquery only constrains membership.
EXISTS_SHAPES = [
    ("customer", "c_custkey", "c_nationkey", "orders", "o_custkey",
     "o_orderstatus", ["F", "O", "P"]),
    ("part", "p_partkey", "p_size", "lineitem", "l_partkey",
     "l_returnflag", ["A", "N", "R"]),
    ("orders", "o_orderkey", "o_custkey", "lineitem", "l_orderkey",
     "l_linestatus", ["F", "O"]),
]


def gen_exists_query(i):
    o_t, o_key, o_col, i_t, i_key, i_col, i_vals = rng.choice(EXISTS_SHAPES)
    neg = rng.choice(["EXISTS", "NOT EXISTS"])
    preds = [f"{i_key} = {o_t}.{o_key}"]
    if rng.random() < 0.8:
        vals = rng.sample(i_vals, k=rng.randint(1, len(i_vals) - 1))
        preds.append(f"{i_col} IN ({', '.join(repr(v) for v in vals)})"
                     if len(vals) > 1 else f"{i_col} = '{vals[0]}'")
    return (f"e{i:03d}",
            f"SELECT {o_key} AS k, {o_col} AS a0 FROM {o_t} "
            f"WHERE {neg} (SELECT 1 FROM {i_t} WHERE {' AND '.join(preds)}) "
            f"ORDER BY k")


# correlated SCALAR subqueries — the decorrelation family (q64/q70/q72
# plan shapes) randomized: a per-outer-key aggregate either filters the
# outer row (WHERE threshold) or projects as a column. Determinism: exact
# aggregates only (count / min / max / BIGINT-cast integer sum), integer
# comparisons; an empty correlated group yields NULL → UNKNOWN → dropped
# identically in both engines (count yields 0, also identical).
CORR_SHAPES = [
    # (outer, outer_key, outer_num_col, inner, inner_key, inner_int, inner_pred)
    ("customer", "c_custkey", "c_nationkey", "orders", "o_custkey",
     "o_orderkey % 100", "o_orderstatus = 'F'"),
    ("part", "p_partkey", "p_size", "lineitem", "l_partkey",
     "l_linenumber", "l_returnflag = 'R'"),
    ("orders", "o_orderkey", "o_custkey % 50", "lineitem", "l_orderkey",
     "l_linenumber * 7", "l_linestatus = 'F'"),
]


def gen_corr_scalar_query(i):
    o_t, o_key, o_num, i_t, i_key, i_int, i_pred = rng.choice(CORR_SHAPES)
    agg = rng.choice([f"CAST(count(*) AS BIGINT)",
                      f"CAST(sum({i_int}) AS BIGINT)",
                      f"min({i_int})", f"max({i_int})"])
    preds = [f"{i_key} = {o_t}.{o_key}"]
    if rng.random() < 0.5:
        preds.append(i_pred)
    sub = f"(SELECT {agg} FROM {i_t} WHERE {' AND '.join(preds)})"
    if rng.random() < 0.5:  # WHERE-threshold variant (q70's shape)
        op = rng.choice(["<", "<=", ">", ">=", "="])
        return (f"c{i:03d}",
                f"SELECT {o_key} AS k, {o_num} AS a0 FROM {o_t} "
                f"WHERE {o_num} {op} {sub} ORDER BY k")
    # projection variant (the enrich-with-rollup shape)
    return (f"c{i:03d}",
            f"SELECT {o_key} AS k, {sub} AS a0 FROM {o_t} "
            f"WHERE {o_key} <= 500 ORDER BY k")


# FILTER-clause aggregates (the q94 surface) randomized: exact aggregates
# only (count / min / max / BIGINT-cast integer sum), each with an
# independent FILTER predicate, all folding into one aggregate pass.
def gen_filter_query(i):
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    groups = rng.sample(spec["group"], k=rng.randint(1, min(2, len(spec["group"]))))
    aggs = ["count(*) AS cnt"]
    for j in range(rng.randint(1, 3)):
        pred = gen_pred(t)
        kind = rng.choice(["cnt", "sum_int", "minmax_int", "minmax_str"])
        if kind == "cnt":
            aggs.append(f"count(*) FILTER (WHERE {pred}) AS a{j}")
        elif kind == "sum_int":
            c = rng.choice(spec["int"])
            aggs.append(f"CAST(sum({c}) FILTER (WHERE {pred}) AS BIGINT) AS a{j}")
        elif kind == "minmax_int":
            c = rng.choice(spec["int"])
            f = rng.choice(["min", "max"])
            aggs.append(f"{f}({c}) FILTER (WHERE {pred}) AS a{j}")
        else:
            c = rng.choice(spec["str"])
            f = rng.choice(["min", "max"])
            aggs.append(f"{f}({c}) FILTER (WHERE {pred}) AS a{j}")
    gsel = [f"{g} AS g{k}" for k, g in enumerate(groups)]
    gnames = [f"g{k}" for k in range(len(groups))]
    return (f"l{i:03d}",
            f"SELECT {', '.join(gsel + aggs)} FROM {t} "
            f"GROUP BY {', '.join(groups)} ORDER BY {', '.join(gnames)}")


def gen_conditional_query(i):
    # CASE / coalesce / nullif / greatest / least / IS [NOT] DISTINCT FROM —
    # the null-semantics + implicit-widening surface the registry leans on.
    # Type-parity discipline: any expression mixing integer widths is CAST
    # to BIGINT (greatest(INT, BIGINT) etc. widen differently per engine);
    # nullif feeds coalesce so the NULL branch actually executes.
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    key = spec["int"][0]
    sels = [f"{key} AS k"]
    for j in range(rng.randint(2, 4)):
        kind = rng.choice(["case", "coalesce_nullif", "greatest", "least",
                           "case_str", "nullif_str"])
        if kind == "case":
            c = rng.choice(spec["int"])
            cut = rng.randint(1, 5000)
            sels.append(f"CASE WHEN {c} < {cut} THEN 'lo' "
                        f"WHEN {c} < {cut * 2} THEN 'mid' ELSE 'hi' END AS a{j}")
        elif kind == "coalesce_nullif":
            c = rng.choice(spec["int"])
            m = rng.randint(2, 9)
            sels.append(f"CAST(coalesce(nullif({c} % {m}, 0), -1) AS BIGINT) AS a{j}")
        elif kind in ("greatest", "least"):
            a, b = rng.choice(spec["int"]), rng.choice(spec["int"])
            sels.append(f"CAST({kind}({a}, {b}, {rng.randint(0, 100)}) AS BIGINT) AS a{j}")
        elif kind == "case_str":
            c = rng.choice(spec["str"])
            sels.append(f"CASE WHEN {c} IS NOT NULL AND length({c}) > "
                        f"{rng.randint(0, 4)} THEN upper({c}) ELSE '-' END AS a{j}")
        else:
            a, b = rng.sample(spec["str"], k=2) if len(spec["str"]) >= 2 \
                else (spec["str"][0], spec["str"][0])
            sels.append(f"coalesce(nullif({a}, {b}), '=') AS a{j}")
    # IS DISTINCT FROM in the predicate: null-safe comparison parity
    pred = ""
    if rng.random() < 0.6:
        c = rng.choice(spec["str"])
        v = rng.choice(TABLES[t]["predcols"][-1][2]) if TABLES[t]["predcols"][-1][1] == "str" \
            else "x"
        neg = rng.choice(["", "NOT "])
        pred = f" AND {c} IS {neg}DISTINCT FROM '{v}'"
    return (f"n{i:03d}",
            f"SELECT {', '.join(sels)} FROM {t} WHERE {key} <= 800{pred} ORDER BY k")


# CC-keeper shapes (the p17/p53/p56 mechanism family, randomized): a
# synthetic PATH graph over a unique-key column — each residue class mod m
# forms an ascending chain, broken into random segments by a per-edge
# multiplicative-hash coin — then WITH RECURSIVE descending reachability
# and keeper = min reachable. Soundness of the shared-dialect recursion:
# edges only descend (dst -> src, src < dst) and in/out-degree <= 1 by
# construction (path graph), so UNION ALL recursion terminates in both
# engines without duplicate paths, and walking DOWN a path reaches exactly
# the segment minimum — no undirected ping-pong, no aggregation inside the
# recursive term (which the standard forbids). Spark's recursion depth
# limit (100) dwarfs the bounded chain length.
CC_TABLES = {
    "orders": ("o_orderkey", 6000),
    "events": ("event_id", 5000),
    "part": ("p_partkey", 2000),
    "documents": ("doc_id", 500),
}


def gen_cc_query(i):
    t = rng.choice(list(CC_TABLES))
    key, span = CC_TABLES[t]
    m = rng.randint(2, 7)
    lo = rng.randint(0, span // 2)
    hi = lo + m * rng.randint(10, 40)  # chain length 10..40 per residue
    p = rng.randint(3, 9)              # keep ~p/10 of edges (random breaks)
    c = rng.randint(1, 999983)
    base = (f"base AS (SELECT {key} AS id FROM {t} "
            f"WHERE {key} BETWEEN {lo} AND {hi})")
    edges = (f"edges AS (SELECT b.id AS src, b.id + {m} AS dst FROM base b "
             f"JOIN base b2 ON b2.id = b.id + {m} "
             f"WHERE (b.id * 2654435761 + {c}) % 10 < {p})")
    nodes = ("nodes AS (SELECT src AS id FROM edges "
             "UNION SELECT dst FROM edges)")
    reach = ("reach(id, r) AS (SELECT id, id FROM nodes UNION ALL "
             "SELECT reach.id, e.src FROM reach JOIN edges e ON e.dst = reach.r)")
    labels = ("labels AS (SELECT id, min(r) AS keeper FROM reach GROUP BY id)")
    shape = rng.random()
    if shape < 0.4:  # p17's shape: the labels themselves
        sel = ("SELECT id, keeper, id = keeper AS kept FROM labels "
               "ORDER BY id")
    elif shape < 0.7:  # p53's shape: cluster-size histogram
        sel = ("SELECT cluster_size, count(*) AS n_clusters FROM "
               "(SELECT keeper, count(*) AS cluster_size FROM labels "
               "GROUP BY keeper) GROUP BY cluster_size ORDER BY cluster_size")
    else:  # p56's shape: keeper-vs-dropped funnel
        sel = ("SELECT count(*) AS n_total, "
               "count(*) FILTER (WHERE id = keeper) AS n_kept, "
               "CAST(sum(keeper) AS BIGINT) AS keeper_sum FROM labels")
    return (f"y{i:03d}",
            f"WITH RECURSIVE {base}, {edges}, {nodes}, {reach}, {labels} {sel}")


# Manifest-arc shapes (the p68/p71 family, randomized): per-shard integrity
# manifests — count, BIGINT byte total, order-independent bit_xor checksum
# over a multiplicative hash — optionally FOLD-compacted into super-shards
# (sum/sum/bit_xor re-aggregation, whose correctness is exactly the
# mergeable-checksum property the manifest arc relies on). Integer-only
# arithmetic; hash products stay far under 2^63 at every fixture scale so
# both engines compute identical BIGINTs.
MANIFEST_TABLES = {
    "orders": ("o_orderkey", ["o_custkey", "o_orderkey"]),
    "lineitem": ("l_orderkey", ["l_partkey", "l_suppkey"]),
    "events": ("event_id", ["user_id", "event_id"]),
    "documents": ("doc_id", ["n_chars", "doc_id"]),
}


def gen_manifest_query(i):
    t = rng.choice(list(MANIFEST_TABLES))
    key, ints = MANIFEST_TABLES[t]
    S = rng.randint(8, 64)
    c = rng.randint(1, 999983)
    vol = rng.choice(ints)
    hash_expr = f"({key} * 2654435761 + {c}) % 1099511627776"  # 2^40 keyspace
    pred = f" WHERE {gen_pred(t)}" if t in TABLES and rng.random() < 0.5 else ""
    shards = (f"shards AS (SELECT CAST({key} % {S} AS BIGINT) AS shard, "
              f"count(*) AS n, CAST(sum({vol}) AS BIGINT) AS vol, "
              f"bit_xor(CAST({hash_expr} AS BIGINT)) AS checksum "
              f"FROM {t}{pred} GROUP BY 1)")
    if rng.random() < 0.5:  # p68's shape: emit the manifest
        sel = "SELECT * FROM shards ORDER BY shard"
    else:  # p71's shape: fold-compact into super-shards
        F = rng.randint(2, 6)
        sel = (f"SELECT shard % {F} AS super_shard, CAST(sum(n) AS BIGINT) AS n, "
               f"CAST(sum(vol) AS BIGINT) AS vol, bit_xor(checksum) AS checksum "
               f"FROM shards GROUP BY 1 ORDER BY 1")
    return (f"m{i:03d}", f"WITH {shards} {sel}")


# Correlated LATERAL subqueries (the q45 surface, randomized) in both
# decorrelation classes: the aggregate lateral (one row per outer row,
# count/sum/min-max — empty correlated groups yield cnt=0/NULL sums
# identically cross-engine) and the top-n lateral (ORDER BY ... LIMIT n —
# probed bit-exact in both engines before this family landed: Spark 4
# decorrelates limited correlated subqueries). Top-n determinism: the
# ORDER BY covers EVERY selected column, so any residual tie is between
# fully-identical rows and the engines' pick is invisible to the row-set
# compare — this fixture's l_linenumber is NOT unique per order (11,785
# duplicate (orderkey, linenumber) pairs), which the first seed found as
# a phantom mismatch when the order key was assumed unique.
LATERAL_SHAPES = [
    # (outer, okey, ocol, cap, inner, ikey, order_cols, val, predtable)
    ("customer", "c_custkey", "c_nationkey", 1500, "orders", "o_custkey",
     ["o_orderkey"], "o_totalprice", "orders"),
    ("orders", "o_orderkey", "o_custkey", 4000, "lineitem", "l_orderkey",
     ["l_linenumber"], "l_partkey", "lineitem"),
    ("part", "p_partkey", "p_size", 600, "lineitem", "l_partkey",
     ["l_orderkey", "l_linenumber"], "l_suppkey", "lineitem"),
]


def gen_lateral_query(i):
    ot, okey, ocol, cap, it, ikey, ucols, val, pt = rng.choice(LATERAL_SHAPES)
    pred = f" AND {gen_pred(pt)}" if rng.random() < 0.5 else ""
    if rng.random() < 0.5:  # correlated-aggregate lateral
        agg_val = (f"CAST(sum({val}) AS BIGINT)" if val != "o_totalprice"
                   else f"max({val})")  # double sums aren't order-exact
        aggs = (f"count(*) AS cnt, {agg_val} AS a0, "
                f"{rng.choice(['min', 'max'])}({ucols[-1]}) AS a1")
        nonempty = " AND l.cnt > 0" if rng.random() < 0.5 else ""
        return (f"t{i:03d}",
                f"SELECT o.{okey} AS k, o.{ocol} AS a9, l.cnt, l.a0, l.a1 "
                f"FROM {ot} o, LATERAL (SELECT {aggs} FROM {it} "
                f"WHERE {ikey} = o.{okey}{pred}) l "
                f"WHERE o.{okey} <= {cap}{nonempty} ORDER BY k")
    n = rng.randint(1, 3)
    d = rng.choice(["", " DESC"])
    rks = [f"rk{j}" for j in range(len(ucols))]
    sel = ", ".join(f"{c} AS {r}" for c, r in zip(ucols, rks))
    order = ", ".join(f"{c}{d}" for c in ucols + [val])
    return (f"t{i:03d}",
            f"SELECT o.{okey} AS k, {', '.join('l.' + r for r in rks)}, l.v "
            f"FROM {ot} o, LATERAL (SELECT {sel}, {val} AS v FROM {it} "
            f"WHERE {ikey} = o.{okey}{pred} ORDER BY {order} LIMIT {n}) l "
            f"WHERE o.{okey} <= {cap} ORDER BY k, {', '.join(rks)}")


# ---- d-family: decimal-boundary aggregates (verdict r9 item #4a) ------
# Randomized GROUP BY sums driven PAST the 2^53/10^6 decSum boundary by an
# integer magnitude factor, exercising the magnitude-proof routes the
# registry converted to in r9/r10: the exact scale-6 string (decSumStr),
# the unscaled-BIGINT value (decSumUnscaled), and the unscaled ratio
# (decRatio). Determinism: the multiplied expression is evaluated in IEEE
# doubles identically per row in both engines (same parquet values, same
# op order in one shared string), quantized once at DECIMAL(23,6), summed
# exactly. Envelope (measured, not guessed — the first draft of this
# family overflowed its own guard at 10x, which failed LOUDLY as the r10
# red-team spec pins): global 10x sums are 3.2e11 (lineitem extprice) and
# 3.8e11 (orders totalprice), so price-like factors cap at 12 (worst
# 4.5e12, a 2x margin under the 9.2e12 unscaled-BIGINT envelope) while
# quantity (10x sum 1.5e8) can take 40 and straddle the 9e9 decSum
# boundary itself. The family is calibrated for the 1x and 10x gate
# fixtures only.
DEC_SHAPES = [
    ("lineitem", ["l_returnflag", "l_linestatus"],
     [("l_extendedprice", 12), ("l_extendedprice * (1 - l_discount)", 12),
      ("l_quantity", 40)], ("l_returnflag", "R")),
    ("orders", ["o_orderstatus", "o_orderpriority"], [("o_totalprice", 12)],
     ("o_orderstatus", "F")),
]


def _uns(expr):
    return f"CAST(SUM(CAST({expr} AS DECIMAL(23,6))) * 1000000 AS BIGINT)"


def gen_decimal_query(i):
    t, groups_all, exprs, (sgncol, sgnval) = rng.choice(DEC_SHAPES)
    e, kmax = rng.choice(exprs)
    k = rng.randint(3, kmax)
    big = f"({e}) * {k}"
    if rng.random() < 0.35:
        # signed variant: one categorical branch contributes NEGATIVE
        # addends, so sums are mixed-sign (and can land near zero or fully
        # negative) — exercising the exact-string route's sign rendering
        # and the unscaled route's negative BIGINTs. |sum| only shrinks,
        # so the factor envelope above still bounds it.
        big = (f"({e}) * (CASE WHEN {sgncol} = '{sgnval}' "
               f"THEN -{k} ELSE {k} END)")
    groups = rng.sample(groups_all, k=rng.randint(0, 2))
    aggs = ["count(*) AS cnt"]
    route = rng.choice(["str", "uns", "ratio", "both"])
    if route in ("str", "both"):
        aggs.append(f"CAST(CAST(SUM(CAST({big} AS DECIMAL(23,6))) "
                    f"AS DECIMAL(33,6)) AS STRING) AS a0")
    if route in ("uns", "both"):
        aggs.append(f"{_uns(big)} AS a1")
    if route == "ratio":
        # sum(k*e)/sum(e) computed the decRatio way: two exact unscaled
        # BIGINTs, one correctly-rounded conversion each, ONE division
        aggs.append(f"1.0 * (CAST({_uns(big)} AS DOUBLE) / "
                    f"CAST({_uns(f'({e})')} AS DOUBLE)) AS a2")
    where = f" WHERE {gen_pred(t)}" if rng.random() < 0.4 else ""
    if groups:
        gsel = [f"{g} AS g{n}" for n, g in enumerate(groups)]
        gnames = [f"g{n}" for n in range(len(groups))]
        return (f"d{i:03d}",
                f"SELECT {', '.join(gsel + aggs)} FROM {t}{where} "
                f"GROUP BY {', '.join(groups)} ORDER BY {', '.join(gnames)}")
    return (f"d{i:03d}", f"SELECT {', '.join(aggs)} FROM {t}{where}")


# ---- v-family: pivot / unpivot shapes (verdict r9 item #4b) ------------
# True PIVOT/UNPIVOT operators, not the conditional-aggregation emulation
# (gen_filter_query covers that): Spark's relational PIVOT/UNPIVOT clauses
# on the Spark side, a hand-built conditional-agg / UNION ALL twin on the
# DuckDB side (the dialects' pivot syntaxes are incompatible, so this
# family uses the fuzzer's paired-SQL mechanism). Aggregates restricted to
# sum/min/max: absent (group, pivot-value) combos are NULL under both the
# PIVOT operator and FILTERed aggregation, whereas count would yield
# NULL-vs-0.
PIVOT_SHAPES = [
    ("lineitem", "l_returnflag", "l_linestatus", ["F", "O"], ["l_partkey", "l_suppkey"]),
    ("orders", "o_orderpriority", "o_orderstatus", ["F", "O", "P"], ["o_custkey"]),
    ("events", "user_id % 10", "event_type",
     ["click", "view", "purchase", "error", "signup"], ["user_id", "event_id"]),
]


def gen_pivot_query(i):
    t, g, pc, vals_all, valcols = rng.choice(PIVOT_SHAPES)
    if rng.random() < 0.5:  # PIVOT
        vals = rng.sample(vals_all, k=rng.randint(2, min(3, len(vals_all))))
        v = rng.choice(valcols)
        agg = rng.choice([("CAST(sum(v) AS BIGINT)", "CAST(sum({c}) {f} AS BIGINT)"),
                          ("min(v)", "min({c}) {f}"),
                          ("max(v)", "max({c}) {f}")])
        where = f" WHERE {gen_pred(t)}" if rng.random() < 0.4 else ""
        in_list = ", ".join(f"'{x}'" for x in vals)
        spark = (f"SELECT * FROM (SELECT {g} AS g0, {pc} AS pc, {v} AS v "
                 f"FROM {t}{where}) "
                 f"PIVOT ({agg[0]} FOR pc IN ({in_list})) ORDER BY g0")
        cols = ", ".join(
            agg[1].format(c="v", f=f"FILTER (WHERE pc = '{x}')") + f' AS "{x}"'
            for x in vals)
        duck = (f"SELECT g0, {cols} FROM (SELECT {g} AS g0, {pc} AS pc, "
                f"{v} AS v FROM {t}{where}) GROUP BY g0 ORDER BY g0")
        return (f"v{i:03d}", spark, duck)
    # UNPIVOT: wide aggregate row -> (metric, val) pairs. All metrics are
    # non-null BIGINTs (sums/counts over non-empty groups), so Spark's
    # exclude-nulls default can't diverge from the UNION ALL twin.
    v = rng.choice(valcols)
    n_metrics = rng.randint(2, 3)
    mdefs = [f"CAST(sum({v}) AS BIGINT) AS m0",
             "CAST(count(*) AS BIGINT) AS m1",
             f"CAST(max({v}) AS BIGINT) AS m2"][:n_metrics]
    where = f" WHERE {gen_pred(t)}" if rng.random() < 0.4 else ""
    base = (f"SELECT {g} AS g0, {', '.join(mdefs)} FROM {t}{where} "
            f"GROUP BY {g}")
    mnames = [f"m{j}" for j in range(n_metrics)]
    spark = (f"SELECT g0, metric, val FROM ({base}) "
             f"UNPIVOT (val FOR metric IN ({', '.join(mnames)})) "
             f"ORDER BY g0, metric")
    arms = " UNION ALL ".join(
        f"SELECT g0, '{m}' AS metric, {m} AS val FROM base" for m in mnames)
    duck = f"WITH base AS ({base}) {arms} ORDER BY g0, metric"
    return (f"v{i:03d}", spark, duck)


# ---- h-family: array / higher-order-function shapes (r9 item #4b) ------
# transform/filter/aggregate/array_sort/sequence lambdas over real token
# arrays (documents.text split on space) and synthetic integer sequences.
# Paired SQL: Spark's HOF names (transform, filter, aggregate, size,
# element_at, sequence) vs DuckDB's list_* family. All outputs are exact
# (integer arithmetic, string min) — no doubles anywhere.
def gen_hof_query(i):
    cap = rng.randint(100, 400)
    shapes = rng.sample(range(4), k=rng.randint(1, 2))
    s_sel, d_sel = [], []
    for j, sh in enumerate(shapes):
        if sh == 0:  # token-length reduce
            s_sel.append(f"CAST(aggregate(transform(split(text, ' '), "
                         f"x -> length(x)), 0, (a, x) -> a + x) AS BIGINT) AS a{j}")
            d_sel.append(f"CAST(list_sum(list_transform(string_split(text, ' '), "
                         f"x -> length(x))) AS BIGINT) AS a{j}")
        elif sh == 1:  # filter + size
            k = rng.randint(2, 8)
            s_sel.append(f"CAST(size(filter(split(text, ' '), "
                         f"x -> length(x) > {k})) AS BIGINT) AS a{j}")
            d_sel.append(f"CAST(len(list_filter(string_split(text, ' '), "
                         f"x -> length(x) > {k})) AS BIGINT) AS a{j}")
        elif sh == 2:  # sort + first element (min token, binary collation)
            # try_element_at, not element_at: under Spark 4 ANSI (the
            # default) element_at THROWS on an empty array — an empty or
            # whitespace-only text filters to [] and would hard-fail the
            # whole fuzz run — while DuckDB's [1] returns NULL. try_
            # returns NULL on out-of-range, matching the DuckDB twin.
            s_sel.append(f"try_element_at(array_sort(filter(split(text, ' '), "
                         f"x -> length(x) >= 1)), 1) AS a{j}")
            d_sel.append(f"list_sort(list_filter(string_split(text, ' '), "
                         f"x -> length(x) >= 1))[1] AS a{j}")
        else:  # data-dependent sequence reduce
            m, b = rng.randint(3, 7), rng.randint(2, 5)
            n = f"CAST(doc_id % {m} + {b} AS INT)"
            s_sel.append(f"CAST(aggregate(sequence(1, {n}), 0, "
                         f"(a, x) -> a + x * x) AS BIGINT) AS a{j}")
            d_sel.append(f"CAST(list_sum(list_transform(generate_series(1, {n}), "
                         f"x -> x * x)) AS BIGINT) AS a{j}")
    spark = (f"SELECT doc_id AS k, {', '.join(s_sel)} FROM documents "
             f"WHERE doc_id <= {cap} ORDER BY k")
    duck = (f"SELECT doc_id AS k, {', '.join(d_sel)} FROM documents "
            f"WHERE doc_id <= {cap} ORDER BY k")
    return (f"h{i:03d}", spark, duck)


def gen_query(i):
    r = rng.random()
    if r < 0.04:
        return gen_cc_query(i)
    if r < 0.08:
        return gen_manifest_query(i)
    if r < 0.13:
        return gen_decimal_query(i)
    if r < 0.18:
        return gen_pivot_query(i)
    if r < 0.23:
        return gen_hof_query(i)
    if r < 0.28:
        return gen_filter_query(i)
    if r < 0.31:
        return gen_conditional_query(i)
    if r < 0.34:
        return gen_scalar_query(i)
    if r < 0.42:
        return gen_setop_query(i)
    if r < 0.49:
        return gen_grouping_query(i)
    if r < 0.54:
        return gen_argmax_query(i)
    if r < 0.59:
        return gen_exists_query(i)
    if r < 0.64:
        return gen_corr_scalar_query(i)
    if r < 0.69:
        return gen_nulljoin_query(i)
    if r < 0.73:
        return gen_notin_query(i)
    if r < 0.77:
        return gen_window_query(i)
    if r < 0.82:
        return gen_frame_query(i)
    if r < 0.86:
        return gen_lateral_query(i)
    if r < 0.92:
        return gen_join_query(i)
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    groups = rng.sample(spec["group"], k=rng.randint(1, min(2, len(spec["group"]))))
    aggs = ["count(*) AS cnt"]
    for j in range(rng.randint(1, 3)):
        kind = rng.choice(["minmax_int", "minmax_double", "minmax_str", "sum_int",
                           "avg_int", "count_col", "count_distinct", "sum_distinct"])
        if kind == "minmax_int":
            c = rng.choice(spec["int"]); f = rng.choice(["min", "max"])
            aggs.append(f"{f}({c}) AS a{j}")
        elif kind == "minmax_double":
            c = rng.choice(spec["double"]); f = rng.choice(["min", "max"])
            aggs.append(f"{f}({c}) AS a{j}")
        elif kind == "minmax_str":
            c = rng.choice(spec["str"]); f = rng.choice(["min", "max"])
            aggs.append(f"{f}({c}) AS a{j}")
        elif kind == "sum_int":
            c = rng.choice(spec["int"])
            # CAST to BIGINT on both sides: DuckDB sums to INT128
            aggs.append(f"CAST(sum({c}) AS BIGINT) AS a{j}")
        elif kind == "avg_int":
            # NOT avg(c): DuckDB's integer-avg finalization can differ from
            # Spark's by 1 ulp (seen at sf0.1). Exact integer sum cast to
            # double, one division — bit-identical in both engines.
            c = rng.choice(spec["int"])
            aggs.append(f"CAST(sum({c}) AS DOUBLE) / count({c}) AS a{j}")
        elif kind == "count_distinct":
            # exact distinct aggregation (Expand + two-phase agg in Spark)
            c = rng.choice(spec["int"] + spec["str"])
            aggs.append(f"count(DISTINCT {c}) AS a{j}")
        elif kind == "sum_distinct":
            c = rng.choice(spec["int"])
            aggs.append(f"CAST(sum(DISTINCT {c}) AS BIGINT) AS a{j}")
        else:
            c = rng.choice(spec["str"])
            aggs.append(f"count({c}) AS a{j}")
    where = ""
    if rng.random() < 0.7:
        preds = [gen_pred(t) for _ in range(rng.randint(1, 2))]
        where = " WHERE " + rng.choice([" AND ", " OR "]).join(preds)
    gsel = [f"{g} AS g{k}" for k, g in enumerate(groups)]
    gnames = [f"g{k}" for k in range(len(groups))]
    return (f"f{i:03d}",
            f"SELECT {', '.join(gsel + aggs)} FROM {t}{where} "
            f"GROUP BY {', '.join(groups)} ORDER BY {', '.join(gnames)}")


# a generator may return (name, shared_sql) or (name, spark_sql, duck_sql)
# — the paired form exists for operators whose syntaxes are incompatible
# across the two dialects (PIVOT/UNPIVOT, the list_*/HOF families). QFILE
# (what graft.RunSql executes) always carries the SPARK side; the DuckDB
# replay below uses the twin when one was registered.
queries, duck_queries = {}, {}
for i in range(N):
    q = gen_query(i)
    queries[q[0]] = q[1]
    duck_queries[q[0]] = q[2] if len(q) > 2 else q[1]
json.dump(queries, open(QFILE, "w"), indent=1)
print(f"generated {N} queries (seed {SEED}) -> {QFILE}")

r = subprocess.run(["sbt", "-batch", f"runMain graft.RunSql {SF_DIR} {QFILE} {OUT}"],
                   capture_output=True, text=True, cwd="/root/repo")
for l in (r.stdout + r.stderr).splitlines():
    if "[runsql]" in l:
        print(l)
if r.returncode != 0:
    print("SPARK RUN FAILED"); sys.exit(1)

import duckdb
con = duckdb.connect()
ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
for t in ALL_TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

fails = passes = 0
for name, sql in sorted(queries.items()):
    try:
        got_rel = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        cols = [c.lower() for c in got_rel.columns]
        got = sorted(map(tuple, got_rel.fetchall()), key=str)
        want_rel = con.sql(duck_queries[name])
        wcols = [c.lower() for c in want_rel.columns]
        want = sorted(map(tuple, want_rel.fetchall()), key=str)
    except Exception as e:
        print(f"FAIL {name}: EXEC {e}\n  {sql}"); fails += 1; continue
    if cols != wcols:
        print(f"FAIL {name}: COLS {cols} vs {wcols}\n  {sql}"); fails += 1; continue
    # type parity too — the driver's hasher is type-sensitive (r5 p43/p51/p60)
    ts = [str(t) for t in got_rel.types]
    wts = [str(t) for t in want_rel.types]
    if ts != wts:
        print(f"FAIL {name}: TYPES {ts} vs {wts}\n  {sql}"); fails += 1; continue
    if got != want:
        print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
        for g, w in list(zip(got, want))[:3]:
            if g != w:
                print(f"  spark={g}\n  duck ={w}")
        print(f"  {sql}")
        fails += 1
        continue
    passes += 1

print(f"\n{passes}/{len(queries)} fuzz queries match exactly")
sys.exit(1 if fails else 0)
