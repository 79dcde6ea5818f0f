#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views named
after the parquet tables in <sfDir>, and compares strictly:
  - column names (sorted) must match
  - row counts must match
  - values must match exactly after sorting columns by name and rows
    by all columns (floats compared bit-exactly first, then with 1e-9
    relative tolerance reported separately)
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return ("f", v)
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    out = [tuple(r[i] for i in order) for r in data]
    return sorted(cols), out


def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols, s_rows = rows_of(spark_rel)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(s_rows)} rows")
            continue
        try:
            d_cols, d_rows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            failures += 1
            continue
        try:
            s_sorted = sorted(s_rows, key=lambda r: tuple(str(x) for x in r))
            d_sorted = sorted(d_rows, key=lambda r: tuple(str(x) for x in r))
        except Exception:
            s_sorted, d_sorted = s_rows, d_rows
        exact = s_sorted == d_sorted
        if exact:
            print(f"  OK  {name}: {len(s_rows)} rows exact")
            continue
        # find first mismatch, check approx
        ok_approx = True
        first = None
        for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
            for j, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    if first is None:
                        first = (i, s_cols[j], x, y)
                    if not approx_eq(x, y):
                        ok_approx = False
        if ok_approx:
            print(f"WARN {name}: approx-only match (float drift); first diff row {first[0]} col {first[1]}: {first[2]!r} vs {first[3]!r}")
            failures += 1
        else:
            print(f"FAIL {name}: value mismatch row {first[0]} col {first[1]}: spark={first[2]!r} duck={first[3]!r}")
            failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(names) - failures}/{len(names)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
