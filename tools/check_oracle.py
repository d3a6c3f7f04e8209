#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate:
read Verify.scala's parquet dumps, run each oracle SQL in DuckDB over
the same sf tables, and compare row counts / column names / values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]
(Not part of the Scala library; mirrors the driver's DuckDB compare.)
"""
import sys, os, json, math
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_types import compatible  # shared type-compat rules (r19 verdict #2)

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and format stably
        if v == 0.0:
            v = 0.0
        return repr(v)
    return repr(v)

def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        s_cols = [c.lower() for c in spark_rel.columns]
        s_rows = spark_rel.fetchall()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(s_rows)} rows")
            continue
        try:
            duck_rel = con.sql(oracle[name])
            d_cols = [c.lower() for c in duck_rel.columns]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        # physical-type gate: the driver's hash is type-sensitive, so a
        # value-equal oracle that widens (HUGEINT over BIGINT) still
        # fails the round — catch it here, where values alone can't
        s_types = {r[0].lower(): r[1]
                   for r in con.sql(f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall()}
        d_types = {r[0].lower(): r[1]
                   for r in con.sql(f"DESCRIBE ({oracle[name]})").fetchall()}
        for c, st in s_types.items():
            dt = d_types.get(c)
            if dt is not None and not compatible(st, dt):
                print(f"[FAIL] {name}: column {c!r} type spark={st} duck={dt}")
                ok = False
        if sorted(s_cols) != sorted(d_cols):
            print(f"[FAIL] {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"[FAIL] {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            sk = sorted(table_key(s_rows, s_cols))
            dk = sorted(table_key(d_rows, d_cols))
            if sk != dk:
                diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                print(f"[FAIL] {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"[ok] {name}: {len(s_rows)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
