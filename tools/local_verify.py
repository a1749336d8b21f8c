#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate: load each
Verify output parquet, run the paired oracle SQL in DuckDB over the same
testdata, sort columns by name + rows by value, and compare exactly.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [queryName...]
"""
import json, sys, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols = [c.lower() for c in spark_rel.columns]
        s_rows = spark_rel.fetchall()
        d_rel = con.sql(oracle[name])
        d_cols = [c.lower() for c in d_rel.columns]
        d_rows = d_rel.fetchall()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: error {e}")
        continue
    sc, sr = canon(s_rows, s_cols)
    dc, dr = canon(d_rows, d_cols)
    if sc != dc:
        fails.append(name)
        print(f"FAIL {name}: schema spark={sc} duckdb={dc}")
    elif sr != dr:
        fails.append(name)
        diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        extra_s = [r for r in sr[:5000] if r not in set(dr)][:2]
        extra_d = [r for r in dr[:5000] if r not in set(sr)][:2]
        print(f"FAIL {name}: rows spark={len(sr)} duckdb={len(dr)} "
              f"firstdiff={diff} onlyspark={extra_s} onlyduck={extra_d}")
    else:
        print(f"OK   {name} ({len(sr)} rows)")

print(f"\n{len(oracle) - len(fails) if not only else '?'}/{len(oracle)} green" if not only else "")
sys.exit(1 if fails else 0)
