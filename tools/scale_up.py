#!/usr/bin/env python3
"""Deterministic sf1.0 scale-up of the driver testdata (VERDICT r4 #4).

Builds <out>/ (default /tmp/sf1.0) from /root/testdata/sf0.1 by re-keyed
replication, following the driver's own growth shape between shipped SFs
(documents/lineitem 10x, embeddings 4x — the 0.01->0.1 ratio):

- copy i of a row offsets every entity key by i * (max_key + 1 rounded
  to the table's stride), so referential integrity (orders->customer,
  lineitem->orders/part/supplier, events->user) and key-uniqueness
  assumptions ((user_id, ts) unique for the ASOF oracle) survive;
- doc_id/vec_id stay CONTIGUOUS from 0 (copy 0 is the original slice),
  preserving the corpus-shape contracts the operators require() —
  splice-plant sources 0..39, eval set 0..49, plant offsets 100000 /
  500000 clear of the id range;
- text/embedding payloads are copied verbatim: clones are exact
  near-dups, which is precisely the non-vacuous stress for the dedup
  caps (hot buckets engage, signature ties exercise the (score, id)
  tiebreaks identically in both engines);
- nation/region stay as-is (dimension tables referenced by copied
  foreign keys).

No RNG, no wall clock: byte-deterministic output given the input.
Verification tooling only — the engine under test never reads this file.

Usage: python3 tools/scale_up.py [out_dir]
Then:  sbt -batch "runMain graft.Verify /tmp/sf1.0 /tmp/verify_sf1"
       (and the DuckDB compare from .claude/skills/verify/SKILL.md
        with sf=/tmp/sf1.0)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"

# (table, copies, [(key_column, stride), ...]) — stride 0 = derive from
# max(key)+1 of the source slice
PLAN = [
    ("documents", 10, [("doc_id", 5000)]),
    ("embeddings", 4, [("vec_id", 2000)]),
    ("events", 10, [("event_id", 100000), ("user_id", 0)]),
    ("customer", 10, [("c_custkey", 0)]),
    ("orders", 10, [("o_orderkey", 0), ("o_custkey", 0, "customer", "c_custkey")]),
    ("supplier", 10, [("s_suppkey", 0)]),
    ("part", 10, [("p_partkey", 0)]),
    ("lineitem", 10, [
        ("l_orderkey", 0, "orders", "o_orderkey"),
        ("l_partkey", 0, "part", "p_partkey"),
        ("l_suppkey", 0, "supplier", "s_suppkey")]),
    ("nation", 1, []),
    ("region", 1, []),
]


def stride_of(con, table, col, given):
    if given:
        return given
    return con.sql(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for spec in PLAN:
        table, copies, keys = spec[0], spec[1], spec[2]
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
        exprs = []
        keymap = {}
        for k in keys:
            col, given = k[0], k[1]
            # a foreign key uses the REFERENCED table's stride
            ref_table, ref_col = (k[2], k[3]) if len(k) == 4 else (table, col)
            keymap[col] = stride_of(con, ref_table, ref_col, given)
        for c in cols:
            if c in keymap:
                exprs.append(f"{c} + i.i * {keymap[c]} AS {c}")
            else:
                exprs.append(c)
        sel = ", ".join(exprs)
        q = (f"COPY (SELECT {sel} FROM '{SRC}/{table}.parquet' "
             f"CROSS JOIN (SELECT unnest(range({copies})) AS i) i "
             f"ORDER BY {cols[0]}) TO '{OUT}/{table}.parquet' (FORMAT parquet)")
        con.sql(q)
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows -> {OUT}/{table}.parquet")


if __name__ == "__main__":
    main()
