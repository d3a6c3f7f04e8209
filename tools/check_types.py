#!/usr/bin/env python3
"""Oracle result-TYPE gate (r19 verdict #2): the driver's hash compare
is type-sensitive, so a DuckDB oracle whose column widens past the
Spark result's physical type (sum(BIGINT) -> HUGEINT was the live
case) fails the round even when every value matches. This tool
DESCRIBEs each oracle in DuckDB (plans only, never executes) and
checks every output column's type against the Spark result schema.

Usage: python3 tools/check_types.py <sfDir> <oracle_sql.json> <schemas.json>
  schemas.json: {query: {column: duck-family}} from Verify.writeSchemaJson.
Exit 1 on any incompatible column.

Compatibility rules (from a survey of all 262 green queries at r20):
  - identical type names: ok
  - integers: ok iff the DuckDB width <= the Spark width (duck INTEGER
    under spark BIGINT is observed driver-green; HUGEINT under BIGINT
    is the proven driver-red signature)
  - TIMESTAMP <-> TIMESTAMP WITH TIME ZONE: ok (session TZ is UTC on
    both engines)
  - spark ANY (struct/map results): duck must be a container too
  - arrays recurse on the element type
  - everything else (DOUBLE vs BIGINT, DECIMAL precision drift, ...):
    FAIL -- cast explicitly on one side.
"""
import sys, os, json
import duckdb

INT_WIDTH = {
    "TINYINT": 8, "SMALLINT": 16, "INTEGER": 32, "BIGINT": 64,
    "UTINYINT": 8, "USMALLINT": 16, "UINTEGER": 32, "UBIGINT": 64,
    "HUGEINT": 128, "UHUGEINT": 128,
}
TS = {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"}


def compatible(spark_t, duck_t):
    """spark_t: duck-family name from Verify.duckTypeOf; duck_t: DESCRIBE output."""
    s, d = spark_t.strip().upper(), duck_t.strip().upper()
    if s == d:
        return True
    if s == "ANY":
        return d.startswith("STRUCT(") or d.startswith("MAP(")
    if s.endswith("[]") and d.endswith("[]"):
        return compatible(s[:-2], d[:-2])
    if s in INT_WIDTH and d in INT_WIDTH:
        return INT_WIDTH[d] <= INT_WIDTH[s]
    if s in TS and d in TS:
        return True
    return False


def connect(sf_dir):
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def check_query(con, name, sql, spark_types):
    """spark_types: {lowercased column: duck-family}. Returns list of problems."""
    try:
        duck = {r[0].lower(): r[1] for r in con.sql(f"DESCRIBE ({sql})").fetchall()}
    except Exception as e:
        return [f"oracle DESCRIBE error: {e}"]
    probs = []
    for col, st in spark_types.items():
        dt = duck.get(col)
        if dt is None:
            probs.append(f"column {col!r} missing from oracle result")
        elif st.startswith("UNMAPPED:"):
            probs.append(f"column {col!r}: spark type {st} has no duck mapping "
                         "(extend Verify.duckTypeOf)")
        elif not compatible(st, dt):
            probs.append(f"column {col!r}: spark={st} duck={dt}")
    for col in duck:
        if col not in spark_types:
            probs.append(f"oracle column {col!r} missing from spark result")
    return probs


def main():
    sf_dir, oracle_path, schemas_path = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(oracle_path) as f:
        oracle = json.load(f)
    with open(schemas_path) as f:
        schemas = json.load(f)
    con = connect(sf_dir)
    n_pass = n_fail = n_skip = 0
    for name in sorted(schemas):
        if name not in oracle:
            n_skip += 1  # rows-only query: no oracle, nothing to type-check
            continue
        spark_types = {c.lower(): t for c, t in schemas[name].items()}
        probs = check_query(con, name, oracle[name], spark_types)
        if probs:
            n_fail += 1
            for p in probs:
                print(f"[TYPE-FAIL] {name}: {p}")
        else:
            n_pass += 1
    print(f"== types: {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
