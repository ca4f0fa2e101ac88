#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle_sql.json query in DuckDB over the same parquet tables and
compares against the Verify.scala parquet dumps: row count, column names
(sorted), and value-by-value equality both order-strict and row-sorted.

Usage: python3 tools/compare.py [sfdir] [outdir]
"""
import duckdb, sys, json, math, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# The strict-row-order check relies on CTAS carrying each oracle's
# ORDER BY into the temp table's scan order — pin the setting that
# guarantees it rather than trusting the default.
con.execute("SET preserve_insertion_order = true")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    path = f"{out}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL {name}: no spark output at {path}")
        fails += 1
        continue
    try:
        # Materialize each side ONCE into a temp table: DuckDBPyRelation
        # re-executes the query per .df()/.fetchall(), which doubles the
        # cost of heavy oracles (recursive-CTE closures, LSH unions).
        # CTAS preserves the query's ORDER BY in scan order.
        con.execute(f"CREATE OR REPLACE TEMP TABLE _mine AS SELECT * FROM '{path}/*.parquet'")
        con.execute(f"CREATE OR REPLACE TEMP TABLE _gold AS {sql}")
        mine = con.sql("SELECT * FROM _mine")
        gold = con.sql("SELECT * FROM _gold")
    except Exception as e:
        print(f"FAIL {name}: query error: {e}")
        fails += 1
        continue
    mc = sorted(c.lower() for c in mine.columns)
    gc = sorted(c.lower() for c in gold.columns)
    if mc != gc:
        print(f"FAIL {name}: columns mine={mc} gold={gc}")
        fails += 1
        continue
    # Driver-parity checks (learned from CORRECTNESS_r02): the driver
    # compares pandas frames, so (a) an int64-vs-float64 skew fails its
    # hash even when values match (DuckDB SUM(int) -> HUGEINT -> float64;
    # fix: CAST(... AS BIGINT) in the oracle), and (b) array-typed cells
    # crash its sort_values. int-width and datetime-unit skews are fine.
    mdf, gdf = mine.df(), gold.df()
    gl2c_m = {c.lower(): c for c in mdf.columns}
    gl2c_g = {c.lower(): c for c in gdf.columns}
    dtype_bad = []
    for c in mc:
        mk, gk = str(mdf.dtypes[gl2c_m[c]]).rstrip("0123456789[]nsu"), \
                 str(gdf.dtypes[gl2c_g[c]]).rstrip("0123456789[]nsu")
        if {mk, gk} == {"int", "float"}:
            dtype_bad.append((c, mk, gk))
        if mk == "object" and len(mdf) and \
           type(mdf[gl2c_m[c]].iloc[0]).__name__ == "ndarray":
            dtype_bad.append((c, "array-cell", "driver-sort-crash"))
    if dtype_bad:
        print(f"FAIL {name}: driver-dtype risk {dtype_bad}")
        fails += 1
        continue
    mrows = mine.fetchall()
    grows = gold.fetchall()
    mcols = [c.lower() for c in mine.columns]
    gcols = [c.lower() for c in gold.columns]
    mi = [mcols.index(c) for c in mc]
    gi = [gcols.index(c) for c in mc]
    mnorm = [tuple(norm(r[i]) for i in mi) for r in mrows]
    gnorm = [tuple(norm(r[i]) for i in gi) for r in grows]
    if len(mnorm) != len(gnorm):
        print(f"FAIL {name}: rows mine={len(mnorm)} gold={len(gnorm)}")
        fails += 1
        continue
    strict = mnorm == gnorm
    sorted_eq = sorted(mnorm) == sorted(gnorm)
    if strict:
        print(f"PASS {name} ({len(mnorm)} rows, strict)")
    elif sorted_eq:
        print(f"WARN {name} ({len(mnorm)} rows): matches only after row-sort")
    else:
        diffs = [(a, b) for a, b in zip(sorted(mnorm), sorted(gnorm)) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
        fails += 1

missing = [n for n in sorted(os.listdir(out))
           if os.path.isdir(f"{out}/{n}") and n not in oracle]
if missing:
    print(f"NOTE rows-only (no oracle): {missing}")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
