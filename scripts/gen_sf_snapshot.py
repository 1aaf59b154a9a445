#!/usr/bin/env python3
"""Generate SF-PINNED snapshot-oracle resources from a Verify run.

Usage: python3 scripts/gen_sf_snapshot.py <verifyOutDir> <name> [<name>...]

For registry entries whose semantics are NOT SQL-expressible in DuckDB
(xxhash64 signatures, seeded k-means/SRP projections, JVM Deflater,
JPEG decode, HLL/Misra-Gries sketches), the oracle is a committed
snapshot of the deterministic output at the driver's gate SF (sf0.01):
a regression PIN, not an independent recomputation — the independent
check lives in each entry's ScalaTest spec. Only entries proven
run-to-run deterministic (two independent Verify runs byte-compared,
see CORRECTNESS workflow) may be pinned here; regenerate ONLY after a
deliberate semantic change, and review the diff as expected values.

Emits src/main/resources/graft/oracles/<name>.sql and round-trip-checks
the generated SQL against the parquet with the driver-gate comparison.
"""
import sys

import duckdb

sys.path.insert(0, 'scripts')
from check import frame

OUT = sys.argv[1]
NAMES = sys.argv[2:]
con = duckdb.connect()


def lit(v, t):
    if v is None:
        return f"CAST(NULL AS {t})"
    if t == 'VARCHAR':
        return "'" + str(v).replace("'", "''") + "'"
    if t in ('INTEGER', 'BIGINT'):
        return str(v)
    if t == 'BOOLEAN':
        return 'TRUE' if v else 'FALSE'
    if t == 'DOUBLE':
        # repr is the shortest round-trip form. MUST go through a
        # string cast: a bare decimal literal is typed DECIMAL(w,s) by
        # DuckDB and re-rounds, while VARCHAR→DOUBLE is the
        # correctly-rounded parse that reproduces the exact binary64.
        import math
        assert math.isfinite(v), f"non-finite double {v} needs explicit handling"
        return f"CAST('{float(v)!r}' AS DOUBLE)"
    raise ValueError(f"unhandled oracle literal type {t}")


def gen(name):
    cur = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet') ORDER BY ALL")
    cols, types, rows = list(cur.columns), [str(t) for t in cur.types], cur.fetchall()
    assert rows, f"{name}: empty output, refusing to pin"
    vals = ",\n".join("(" + ", ".join(lit(v, t) for v, t in zip(r, types)) + ")" for r in rows)
    casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
    sql = (f"-- SF-PINNED snapshot oracle ({len(rows)} rows at the driver gate\n"
           f"-- SF, sf0.01): a committed regression pin of a deterministic but\n"
           f"-- non-SQL-expressible output. Regenerate ONLY after a deliberate\n"
           f"-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> {name}\n"
           f"WITH t({', '.join(cols)}) AS (VALUES\n{vals})\n"
           f"SELECT {casts} FROM t ORDER BY ALL")
    path = f"src/main/resources/graft/oracles/{name}.sql"
    with open(path, 'w') as f:
        f.write(sql)
    g_cols, g_types, g = frame(con, f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
    w_cols, w_types, w = frame(con, sql)
    assert g_cols == w_cols and g_types == w_types and g == w, f"{name} round-trip mismatch"
    print(f"{name}: {len(rows)} rows -> {path}, round-trip OK")


for n in NAMES:
    gen(n)
