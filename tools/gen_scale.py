#!/usr/bin/env python3
"""Dev-only generator for the SCALE.md probe: build a self-consistent
scaling family {n1, n10} where n10 has 10x the rows of n1 from the SAME
deterministic generator, so sf0.1->sf1-equivalent scaling exponents are
apples-to-apples.

- TPC-H-ish tables + events: n1 = the driver's sf0.1 fixture verbatim;
  n10 = 10 key-offset tiles of it (FKs preserved per tile, value
  distributions identical, key cardinality x10; nation/region stay
  fixed like real dimensions).
- documents + embeddings: regenerated at BOTH sizes by one generator
  (tiling text/vectors would plant artificial cross-tile near-dups and
  corrupt the dedup queries' scaling), with the fixture's vocabulary,
  length distribution, lang/source blocking keys, and a fixed planted
  near-dup rate.

Usage: python3 tools/gen_scale.py /tmp/scale
(Not part of the Scala library; driver-side tooling only.)
"""
import hashlib
import math
import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def tile_sql(con, table, cols, out, copies):
    sel = ", ".join(cols)
    con.sql(
        f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{table}.parquet') "
        f"CROSS JOIN range(0, {copies}) t(c) ORDER BY c) "
        f"TO '{out}/{table}.parquet' (FORMAT parquet)")


def tile_tables(out, copies):
    con = duckdb.connect()
    # spans = max key + 1 of the base fixture, so tiles never collide
    spans = {}
    for t, k in [("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("supplier", "s_suppkey"), ("part", "p_partkey"),
                 ("events", "event_id"), ("events2", "user_id")]:
        tbl = "events" if t == "events2" else t
        spans[k] = con.sql(
            f"select max({k}) + 1 from read_parquet('{SRC}/{tbl}.parquet')").fetchone()[0]
    tile_sql(con, "orders",
             [f"o_orderkey + c * {spans['o_orderkey']} AS o_orderkey",
              f"o_custkey + c * {spans['c_custkey']} AS o_custkey",
              "* EXCLUDE (o_orderkey, o_custkey, c)"], out, copies)
    tile_sql(con, "lineitem",
             [f"l_orderkey + c * {spans['o_orderkey']} AS l_orderkey",
              f"l_partkey + c * {spans['p_partkey']} AS l_partkey",
              f"l_suppkey + c * {spans['s_suppkey']} AS l_suppkey",
              "* EXCLUDE (l_orderkey, l_partkey, l_suppkey, c)"], out, copies)
    tile_sql(con, "customer",
             [f"c_custkey + c * {spans['c_custkey']} AS c_custkey",
              "* EXCLUDE (c_custkey, c)"], out, copies)
    tile_sql(con, "supplier",
             [f"s_suppkey + c * {spans['s_suppkey']} AS s_suppkey",
              "* EXCLUDE (s_suppkey, c)"], out, copies)
    tile_sql(con, "part",
             [f"p_partkey + c * {spans['p_partkey']} AS p_partkey",
              "* EXCLUDE (p_partkey, c)"], out, copies)
    # ts goes out as epoch-NANOS BIGINT: Spark's event reader runs with
    # nanosAsLong=true and derives timestamps via ts div 1000, so a
    # plain int64 nanos column behaves identically to TIMESTAMP_NS
    # (DuckDB's COPY would otherwise silently downcast to micros)
    tile_sql(con, "events",
             [f"event_id + c * {spans['event_id']} AS event_id",
              f"user_id + c * {spans['user_id']} AS user_id",
              "epoch_ns(ts) AS ts",
              "* EXCLUDE (event_id, user_id, ts, c)"], out, copies)
    for t in ("nation", "region"):
        con.sql(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{out}/{t}.parquet' (FORMAT parquet)")


def fixture_profiles():
    con = duckdb.connect()
    vocab = [r[0] for r in con.sql(
        f"select distinct unnest(string_split(text,' ')) w "
        f"from read_parquet('{SRC}/documents.parquet') order by w").fetchall()]
    lens = [r[0] for r in con.sql(
        f"select len(string_split(text,' ')) from read_parquet('{SRC}/documents.parquet')"
    ).fetchall()]
    langsrc = [(r[0], r[1]) for r in con.sql(
        f"select lang, source from read_parquet('{SRC}/documents.parquet')").fetchall()]
    return vocab, lens, langsrc


def gen_documents(out, n, vocab, lens, langsrc):
    rng = random.Random(4242)
    rows = []
    words_prev = None
    langsrc_prev = None
    for i in range(n):
        if i % 20 == 19 and words_prev:
            # planted near-dup of the previous doc: replace every 12th
            # word -> shingle jaccard ~ 0.75-0.9, the LSH regime. It
            # must INHERIT the source doc's (lang, source): the blocked
            # dedup operators (ngram jaccard, edit distance) only pair
            # within a provenance block, so a planted dup with the
            # round-robin provenance would be invisible to them and the
            # scaling probe would run on an effectively dup-free corpus.
            words = list(words_prev)
            for j in range(0, len(words), 12):
                words[j] = rng.choice(vocab)
            lang, source = langsrc_prev
        else:
            words = [rng.choice(vocab) for _ in range(lens[i % len(lens)])]
            lang, source = langsrc[i % len(langsrc)]
        words_prev = words
        langsrc_prev = (lang, source)
        text = " ".join(words)
        rows.append((i, text, lang, source, len(text)))
    con = duckdb.connect()
    con.sql("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR, n_chars BIGINT)")
    # chunked inserts: the n100 tier is 500k rows — one executemany
    # would hold a second full copy of the corpus in flight
    for i in range(0, len(rows), 50000):
        con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows[i:i + 50000])
    con.sql(f"COPY d TO '{out}/documents.parquet' (FORMAT parquet)")


def gen_embeddings(out, n, dim=64, cells=8):
    rng = random.Random(2424)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(cells)]
    rows = []
    prev = None
    for i in range(n):
        if i % 50 == 49 and prev:
            v = [x + rng.gauss(0, 0.01) for x in prev]  # planted near-dup
        else:
            c = centers[i % cells]
            v = [0.7 * c[j] + rng.gauss(0, 0.5) for j in range(dim)]
        prev = v
        rows.append((i, [float(f"{x:.6f}") for x in v], i % cells))
    con = duckdb.connect()
    con.sql("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO e VALUES (?,?,?)", rows)
    con.sql(f"COPY e TO '{out}/embeddings.parquet' (FORMAT parquet)")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale"
    # optional extra tiers: "n30" (docs+embeddings, 30x) and "n100"
    # (documents ONLY, 100x — the dedup-family probe target; tiling
    # the TPC-H tables x100 would cost minutes and GBs the documents
    # queries never read)
    extra = set(sys.argv[2:])
    vocab, lens, langsrc = fixture_profiles()
    for name, mult in [("n1", 1), ("n10", 10)]:
        out = f"{root}/{name}"
        os.makedirs(out, exist_ok=True)
        tile_tables(out, mult)
        gen_documents(out, 5000 * mult, vocab, lens, langsrc)
        gen_embeddings(out, 2000 * mult)
        print(f"[gen_scale] wrote {out}")
    if "n30" in extra:
        out = f"{root}/n30"
        os.makedirs(out, exist_ok=True)
        gen_documents(out, 150000, vocab, lens, langsrc)
        gen_embeddings(out, 60000)
        print(f"[gen_scale] wrote {out} (docs+embeddings only)")
    if "n100" in extra:
        out = f"{root}/n100"
        os.makedirs(out, exist_ok=True)
        gen_documents(out, 500000, vocab, lens, langsrc)
        # embeddings follow the same 100x rule (r17: the similarity
        # family's n100 probes need them; the TPC-H tables stay
        # omitted — the documents/embeddings queries never read them)
        gen_embeddings(out, 200000)
        print(f"[gen_scale] wrote {out} (documents+embeddings only)")


if __name__ == "__main__":
    main()
