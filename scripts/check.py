#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir] [query...]

Reads the parquet results that graft.Verify wrote to outdir, runs each
oracle SQL (outdir/oracle_sql.json) in DuckDB with the testdata tables
registered as views, and compares: columns sorted by name, rows sorted,
values compared exactly (floats: exact unless both NaN).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return [tuple(norm(r[i]) for i in order) for r in data], [cols[i] for i in order]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    # Default to the queries actually dumped into outdir, so a filtered
    # Verify run is checked against exactly what it produced instead of
    # printing a spurious FAIL for every absent query.
    dumped = {d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d))}
    passed, failed = [], []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        if not only and name not in dumped:
            continue
        try:
            got, gcols = rows_of(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
        except Exception as e:
            failed.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            exp, ecols = rows_of(con.sql(sql))
        except Exception as e:
            failed.append((name, f"oracle failed: {str(e)[:300]}"))
            continue
        if gcols != ecols:
            failed.append((name, f"columns differ: spark={gcols} oracle={ecols}"))
            continue
        if len(got) != len(exp):
            failed.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
            continue
        sg, se = sorted(got, key=repr), sorted(exp, key=repr)
        bad = [(a, b) for a, b in zip(sg, se) if a != b]
        if bad:
            failed.append((name, f"{len(bad)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]} cols={gcols}"))
        else:
            passed.append(name)
    for name in passed:
        print(f"PASS {name}")
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
