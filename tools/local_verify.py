#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate: load each
Verify output parquet, run the paired oracle SQL in DuckDB over the same
testdata, sort columns by name + rows by value, and compare exactly.

Also a DTYPE gate the value compare cannot see: python fetchall() collapses
HUGEINT/BIGINT/INTEGER to int, but the driver's hasher is dtype-sensitive —
DuckDB `sum() OVER` returning HUGEINT (int128) where Spark writes BIGINT
went red in round 5 (x_pack_chunks) with bit-identical values. So each
query's DuckDB result dtypes are DESCRIBEd and compared (width-normalized:
int32 vs int64 is benign, int128 / float-vs-int / decimal-vs-float is not)
against the Spark parquet schema, failing loud before the driver does.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [queryName...]
"""
import json, sys, math, re
import duckdb

def norm_type(t):
    """Collapse dtype names to driver-hash-equivalence classes. int widths
    up to 64 bits hash alike; HUGEINT does not (arrow/pandas can't hold
    int128 as int64), nor do float-vs-int, decimal-vs-float, or
    string-vs-anything."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return "int128"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    # containers: normalize element types recursively-ish (textual)
    return re.sub(r"\b(TINYINT|SMALLINT|INTEGER|BIGINT)\b", "int", t)

def dtype_mismatches(con, spark_glob, oracle_sql):
    """[(col, spark_type, duck_type)] where the normalized classes differ."""
    s = {r[0].lower(): r[1] for r in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')").fetchall()}
    d = {r[0].lower(): r[1] for r in con.sql(
        f"DESCRIBE {oracle_sql}").fetchall()}
    bad = []
    for c in sorted(set(s) & set(d)):
        if norm_type(s[c]) != norm_type(d[c]):
            bad.append((c, s[c], d[c]))
    return bad

def main():
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
            spark_glob = f"{out_dir}/{name}/*.parquet"
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{spark_glob}')")
            s_cols = [c.lower() for c in spark_rel.columns]
            s_rows = spark_rel.fetchall()
            d_rel = con.sql(oracle[name])
            d_cols = [c.lower() for c in d_rel.columns]
            d_rows = d_rel.fetchall()
            bad_types = dtype_mismatches(con, spark_glob, oracle[name])
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: error {e}")
            continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            fails.append(name)
            print(f"FAIL {name}: schema spark={sc} duckdb={dc}")
        elif bad_types:
            fails.append(name)
            print(f"FAIL {name}: dtype drift (driver hash is dtype-sensitive) "
                  f"{[(c, f'spark={s}', f'duckdb={d}') for c, s, d in bad_types]}"
                  f" — CAST the oracle column (e.g. HUGEINT from sum() OVER"
                  f" needs CAST(... AS BIGINT))")
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

if __name__ == "__main__":
    main()
