#!/usr/bin/env python3
"""Red-team the retired decimal->double cast class (verdict r9 item #1):
DEMONSTRATE the divergence the r9 headroom audit only measured distance to,
on a committed adversarial fixture, live against DuckDB.

The claim under test: past the 2^53 unscaled boundary a decimal->double
cast rounds DIFFERENTLY between engines — Spark/JVM single-rounds
(BigDecimal.doubleValue falls back to Double.parseDouble for |unscaled| >=
2^52, correctly rounded) while DuckDB converts the int128 unscaled value to
double FIRST and divides by 10^scale SECOND, rounding twice. The committed
fixture (src/test/resources/decimal_redteam.json) sums 200 scale-6 rows to
exactly (2^53+1)/10^6, where the two paths land 1 ulp apart.

Four live assertions (the JVM half lives in DecimalEnvelopeSpec.scala,
which pins the same committed constants from the Spark side):
 1. the OLD decSum route in DuckDB == the committed DuckDB hex AND != the
    committed JVM hex — the retired route provably hash-diverges;
 2. decSumStr's SQL twin == the exact digit string (magnitude-proof);
 3. decSumUnscaled's SQL twin == the exact unscaled BIGINT;
 4. past 2^63 ('over63' group) the shared-SQL unscaled route RAISES in
    DuckDB (out-of-range), i.e. the one asymmetric failure mode left —
    Spark NULL/error vs DuckDB error — fails the gate LOUDLY, never as a
    silent value match.

Usage: python3 tools/red_team_decsum.py   (seconds; no Spark run needed)
"""
import json
import os
import sys
from fractions import Fraction

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "..", "src", "test", "resources",
                   "decimal_redteam.json")

import duckdb

fix = json.load(open(FIX))
scale = fix["scale"]
edge = fix["edge"]
over = fix["over63"]

con = duckdb.connect()
fails = []


def load(name, rows):
    con.execute(f"CREATE TEMP TABLE {name} (v VARCHAR)")
    con.executemany(f"INSERT INTO {name} VALUES (?)", [(r,) for r in rows])


load("edge", edge["rows"])
load("over63", over["rows"])

# -- fixture self-check: the rows really sum to the committed target ----
got_sum = sum(int(r.replace(".", "")) for r in edge["rows"])
if got_sum != edge["target_unscaled"]:
    fails.append(f"fixture edge rows sum to {got_sum}, "
                 f"not {edge['target_unscaled']}")
got_sum2 = sum(int(r.replace(".", "")) for r in over["rows"])
if got_sum2 != over["target_unscaled"]:
    fails.append(f"fixture over63 rows sum to {got_sum2}, "
                 f"not {over['target_unscaled']}")

# -- 1: the retired route diverges, live --------------------------------
old_route = ("SELECT CAST(SUM(CAST(v AS DECIMAL(23,6))) AS DOUBLE) "
             "FROM edge")
duck = con.sql(old_route).fetchone()[0]
want_duck = float.fromhex(edge["expect_duck_hex"])
want_jvm = float.fromhex(edge["expect_spark_hex"])
correct = float(Fraction(edge["target_unscaled"], 10 ** scale))
if want_jvm != correct:
    fails.append(f"committed JVM hex {edge['expect_spark_hex']} is not the "
                 f"correctly-rounded value {correct.hex()}")
if duck != want_duck:
    fails.append(f"DuckDB old-route value moved: {duck.hex()} != committed "
                 f"{edge['expect_duck_hex']} (DuckDB version change? "
                 "re-pin the fixture)")
if duck == want_jvm:
    fails.append("DuckDB old-route value EQUALS the JVM value — the "
                 "divergence this fixture exists to demonstrate is gone")
else:
    print(f"[redteam] old decSum route diverges as committed: "
          f"duck={duck.hex()} jvm={want_jvm.hex()} (1 ulp apart)")

# -- 2/3: the magnitude-proof routes agree exactly ----------------------
s = con.sql("SELECT CAST(CAST(SUM(CAST(v AS DECIMAL(23,6))) AS DECIMAL(33,6))"
            " AS VARCHAR) FROM edge").fetchone()[0]
if s != edge["expect_str"]:
    fails.append(f"decSumStr twin: {s!r} != {edge['expect_str']!r}")
u = con.sql("SELECT CAST(SUM(CAST(v AS DECIMAL(23,6))) * 1000000 AS BIGINT) "
            "FROM edge").fetchone()[0]
if u != edge["target_unscaled"]:
    fails.append(f"decSumUnscaled twin: {u} != {edge['target_unscaled']}")
if not fails:
    print(f"[redteam] decSumStr/decSumUnscaled twins exact on the same "
          f"rows: {s} / {u}")

# -- 4: past 2^63 the shared-SQL unscaled route fails LOUDLY ------------
try:
    v = con.sql("SELECT CAST(SUM(CAST(v AS DECIMAL(23,6))) * 1000000 "
                "AS BIGINT) FROM over63").fetchone()[0]
    fails.append(f"over63: DuckDB returned {v} instead of raising — the "
                 "loud-failure contract of the shared-SQL unscaled route "
                 "is broken")
except Exception as e:
    print(f"[redteam] over63 unscaled route raises in DuckDB as required: "
          f"{str(e).splitlines()[0][:90]}")

# the string route stays exact even past 2^63
s2 = con.sql("SELECT CAST(CAST(SUM(CAST(v AS DECIMAL(23,6))) AS "
             "DECIMAL(33,6)) AS VARCHAR) FROM over63").fetchone()[0]
if s2 != over["expect_str"]:
    fails.append(f"over63 decSumStr twin: {s2!r} != {over['expect_str']!r}")
else:
    print(f"[redteam] decSumStr stays exact past 2^63: {s2}")

print()
if fails:
    for f in fails:
        print(f"FAIL {f}")
    sys.exit(1)
print("DECIMAL RED-TEAM GREEN: the retired route provably diverges; every "
      "magnitude-proof route is exact; past-2^63 fails loudly")
