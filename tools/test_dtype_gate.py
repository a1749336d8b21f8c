#!/usr/bin/env python3
"""Self-test for local_verify's dtype gate: an uncast `sum() OVER` oracle
(DuckDB returns HUGEINT where Spark writes BIGINT) MUST be flagged, and
the CAST(... AS BIGINT) version must not — the exact bug class that went
red in round 5 (x_pack_chunks). Also checks the benign path: int32 vs
int64 width drift is NOT flagged.

Usage: python3 tools/test_dtype_gate.py   (exit 0 = gate works)
"""
import os, sys, tempfile
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from local_verify import dtype_mismatches, norm_type

con = duckdb.connect()
tmp = tempfile.mkdtemp()

# "Spark output": BIGINT cumsum, as Packing.packChunks writes it.
con.execute(f"""COPY (SELECT CAST(i AS BIGINT) AS doc_id,
  CAST((i * (i + 1)) // 2 AS BIGINT) AS end_off,
  CAST(i AS INTEGER) AS small_col
  FROM range(1, 11) t(i)) TO '{tmp}/out.parquet' (FORMAT PARQUET)""")

uncast = """SELECT i AS doc_id,
  sum(i) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS end_off,
  CAST(i AS BIGINT) AS small_col
  FROM range(1, 11) t(i)"""
cast = """SELECT i AS doc_id,
  CAST(sum(i) OVER (ORDER BY i
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off,
  CAST(i AS BIGINT) AS small_col
  FROM range(1, 11) t(i)"""

bad = dtype_mismatches(con, f"{tmp}/out.parquet", uncast)
assert [c for c, _, _ in bad] == ["end_off"], \
    f"uncast sum() OVER should flag exactly end_off, got {bad}"
assert "HUGEINT" in bad[0][2], f"expected HUGEINT on the DuckDB side: {bad}"

ok = dtype_mismatches(con, f"{tmp}/out.parquet", cast)
assert ok == [], f"cast oracle should be clean (small_col int32-vs-int64 is benign), got {ok}"

assert norm_type("HUGEINT") != norm_type("BIGINT")
assert norm_type("INTEGER") == norm_type("BIGINT")
assert norm_type("DOUBLE") != norm_type("BIGINT")
assert norm_type("DECIMAL(38,6)") != norm_type("DOUBLE")

print("dtype gate OK: flags uncast sum() OVER (HUGEINT), passes cast + benign width drift")
