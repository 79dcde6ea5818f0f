#!/usr/bin/env python3
"""Per-query scaling report between two BENCH_FULL json files.

Usage: python3 tools/scale_report.py BENCH_FULL_r07sf01.json BENCH_FULL_sf1.json

Emits a markdown table of time ratios (second run / first run) grouped
by query family, flagging queries whose ratio exceeds 1.5x their
family median — the VERDICT r6 #5 "hidden superlinear query" probe.
Queries under 50 ms in the base run are skipped (timer noise dominates).
"""
import json
import statistics
import sys


def family(name: str) -> str:
    for p in ("q", "join", "dedup", "text", "search", "ann", "emb", "events",
              "curate", "lake", "graph", "fn", "sketch", "window", "sql",
              "mv", "pipeline", "scan", "meta", "set", "agg", "approx",
              "audit", "cube", "rollup", "grouping", "distinct", "topk",
              "subquery", "salted", "profile", "histogram", "ids", "ivm",
              "doc", "unpivot", "stats", "mm"):
        if name == p or name.startswith(p + "_") or (
                p == "q" and name[0] == "q" and name[1].isdigit()):
            return p
    return "other"


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    rows = [(qb[k] / qa[k], qa[k], qb[k], k, family(k))
            for k in qb if k in qa and qa[k] >= 0.05]
    fams = {}
    for r in rows:
        fams.setdefault(r[4], []).append(r[0])
    fmed = {f: statistics.median(v) for f, v in fams.items()}
    print(f"totals: {a['value']:.1f}s -> {b['value']:.1f}s "
          f"({b['value']/a['value']:.2f}x); median query ratio "
          f"{statistics.median([r[0] for r in rows]):.2f}; "
          f"n={len(rows)}; errors {a['n_errors']} -> {b['n_errors']}")
    print()
    print("| ratio | sf0.1 s | sf1 s | family (median) | query | flag |")
    print("|---|---|---|---|---|---|")
    for ratio, t0, t1, k, f in sorted(rows, reverse=True)[:25]:
        flag = "**over family**" if ratio > 1.5 * fmed[f] else ""
        print(f"| {ratio:.1f}x | {t0:.2f} | {t1:.2f} | {f} "
              f"({fmed[f]:.1f}x) | {k} | {flag} |")


if __name__ == "__main__":
    main()
