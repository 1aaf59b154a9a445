#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> [sfDir]

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, and compares: schema (column names), row count, and
values (rows sorted, columns sorted by name — like the driver).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def frame(con, sql):
    cur = con.sql(sql)
    cols = list(cur.columns)
    types = [str(t) for t in cur.types]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols = [cols[i] for i in order]
    types = [types[i] for i in order]
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return cols, types, out


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_cols, got_types, got = frame(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            want_cols, want_types, want = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: cols {got_cols} != {want_cols}")
            n_fail += 1
        # The driver's hash canonicalization is dtype-sensitive (DuckDB
        # HUGEINT vs Spark BIGINT broke 5 entries in round 3 despite
        # bit-identical values), so the local gate must fail on any
        # result-dtype divergence too.
        elif got_types != want_types:
            mism = [(c, a, b) for c, a, b in zip(got_cols, got_types, want_types) if a != b]
            print(f"FAIL {name}: dtypes differ: {mism} (spark-vs-duck)")
            n_fail += 1
        elif got != want:
            diff = [(a, b) for a, b in zip(got, want) if a != b]
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows; first diffs:")
            for a, b in diff[:3]:
                print(f"   spark={a}\n   duck ={b}")
            if len(got) != len(want):
                only_g = [r for r in got if r not in set(want)][:2]
                only_w = [r for r in want if r not in set(got)][:2]
                print(f"   only-spark={only_g}\n   only-duck ={only_w}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
