#!/usr/bin/env python3
"""Regenerate the committed parse-snapshot oracle resources from a Verify run.

Usage: python3 scripts/gen_parse_snapshot.py <verifyOutDir>

Reads <verifyOutDir>/{p_records_flatten,st_report_intake}/ parquet, emits
src/main/resources/graft/oracles/<name>.sql as a typed VALUES oracle, and
round-trip-checks the generated SQL against the parquet with the same
frame comparison the driver gate uses. Run ONLY after a deliberate parser
change, and review the diff — these are EXPECTED values.
"""
import sys
import duckdb
sys.path.insert(0, 'scripts')
from check import frame

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
con = duckdb.connect()


def lit(v, t):
    if v is None:
        return f"CAST(NULL AS {t})"
    if t == 'VARCHAR':
        return "'" + str(v).replace("'", "''") + "'"
    if t == 'INTEGER':
        return str(v)
    if t == 'BOOLEAN':
        return 'TRUE' if v else 'FALSE'
    if t == 'TIMESTAMP':
        return f"TIMESTAMP '{v}'"
    raise ValueError(f"unhandled oracle literal type {t}")


def gen(name, order_by):
    cur = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet') ORDER BY {order_by}")
    cols, types, rows = list(cur.columns), [str(t) for t in cur.types], cur.fetchall()
    vals = ",\n".join("(" + ", ".join(lit(v, t) for v, t in zip(r, types)) + ")" for r in rows)
    casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
    sql = (f"-- Committed expected-parse snapshot of the reference sample corpus\n"
           f"-- ({len(rows)} rows). SF-independent; regenerate from a Verify run\n"
           f"-- with scripts/gen_parse_snapshot.py after a deliberate parser change.\n"
           f"WITH t({', '.join(cols)}) AS (VALUES\n{vals})\n"
           f"SELECT {casts} FROM t ORDER BY {order_by}")
    path = f"src/main/resources/graft/oracles/{name}.sql"
    with open(path, 'w') as f:
        f.write(sql)
    g_cols, g_types, g = frame(con, f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
    w_cols, w_types, w = frame(con, sql)
    assert g_cols == w_cols and g_types == w_types and g == w, f"{name} round-trip mismatch"
    print(f"{name}: {len(rows)} rows -> {path}, round-trip OK")


gen('p_records_flatten', 'report_id, source_ip_address')
gen('st_report_intake', 'report_id, source_ip_address, count')
