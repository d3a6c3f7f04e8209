#!/usr/bin/env python3
"""Dev-only oracle-cost budget: time every SparkEntry.oracleSql query
in DuckDB against an sf dir, print per-query cost sorted descending,
and fail if any single oracle exceeds the budget. The DuckDB sweep is
the product's only hard correctness gate — an oracle too slow to run
is an oracle that doesn't exist (round-15 lesson: unrolled plain-CTE
oracles cost ~420 s and starved the driver's artifact).

Usage: python3 tools/time_oracles.py <sfDir> <oracleSqlJson> [budget_sec]
"""
import sys, os, json, time
import duckdb

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(oracle_path) as f:
        oracle = json.load(f)
    costs, errors = {}, []
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()
            costs[name] = time.time() - t0
        except Exception as e:
            errors.append((name, str(e).split("\n")[0]))
    total = sum(costs.values())
    over = {n: c for n, c in costs.items() if c > budget}
    for n, c in sorted(costs.items(), key=lambda kv: -kv[1])[:25]:
        flag = "  <-- OVER BUDGET" if c > budget else ""
        print(f"{c:8.2f}s  {n}{flag}")
    print(f"== {len(costs)} oracles, total {total:.1f}s, "
          f"{len(over)} over {budget:.0f}s budget, {len(errors)} errors ==")
    for n, e in errors:
        print(f"[ERROR] {n}: {e}")
    sys.exit(1 if (over or errors) else 0)

if __name__ == "__main__":
    main()
