#!/usr/bin/env python3
"""Determinism check: compare two graft.Verify output dirs query by query.

Usage: python3 tools/compare_runs.py <outDirA> <outDirB>

Two runs of the same engine build on the same inputs must agree exactly —
same columns, same multiset of rows (order-insensitive: Verify coalesces
to one file but parquet row order inside a partition is already
deterministic; we sort anyway so the check pins VALUES, not layout).
"""
import os
import sys

import duckdb


def rows_of(con, path):
    rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(r[i] for i in order) for r in rel.fetchall()]
    return sorted(cols), sorted(data, key=lambda r: tuple(str(x) for x in r))


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    names_b = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    failures = 0
    if set(names) != names_b:
        print(f"FAIL: query sets differ: only-A={set(names) - names_b} only-B={names_b - set(names)}")
        failures += 1
    for name in names:
        if name not in names_b:
            continue
        ca, ra = rows_of(con, os.path.join(a, name))
        cb, rb = rows_of(con, os.path.join(b, name))
        if ca != cb:
            print(f"FAIL {name}: columns {ca} vs {cb}")
            failures += 1
        elif ra != rb:
            n = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            print(f"FAIL {name}: {n} differing rows of {len(ra)}/{len(rb)}")
            failures += 1
        else:
            print(f"  OK  {name}: {len(ra)} rows identical")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: determinism over {len(names)} queries")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
