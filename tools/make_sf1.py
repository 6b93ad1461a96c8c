#!/usr/bin/env python3
"""Synthesize the sf1 certification fixture (VERDICT r6 item 8): the
sf0.1 tables replicated x10 with entity keys shifted per replica
(+i*100_000_000, the ScaleCheck scheme) and document tokens
replica-prefixed (z{i}x...) so the near-dup structure inside each
replica is isomorphic to the original instead of 10 exact copies of
every doc; n_chars is recomputed so the n_chars == len(text) invariant
survives the prefixing. Dimension tables (region/nation/supplier/part)
are byte-copied — the catalog does not grow when the corpus does.
Foreign keys shift together (orders.o_custkey with customer.c_custkey,
lineitem.l_orderkey with orders.o_orderkey) so joins stay meaningful
within each replica.

DuckDB does the replication so parquet PHYSICAL types survive exactly
(events.ts stays TIMESTAMP — the engine-vs-oracle type drift the verify
skill warns about). Driver-side tooling only, like oracle_check.py.

Usage: python3 tools/make_sf1.py [dstDir]   (default /tmp/graft_sf1)
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
R, SHIFT = 10, 100_000_000

SHIFTED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],          # part/supplier catalog fixed
    "events": ["event_id", "user_id"],   # 10x density, same time window
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["region", "nation", "supplier", "part"]


def replica_select(con, table, keys, i):
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    sel = []
    for c in cols:
        if c in keys:
            sel.append(f"({c} + {i * SHIFT}) AS {c}")
        elif table == "documents" and c == "text":
            sel.append(f"regexp_replace(text, '(\\S+)', 'z{i}x\\1', 'g') AS text")
        elif table == "documents" and c == "n_chars":
            sel.append("CAST(len(regexp_replace(text, '(\\S+)', "
                       f"'z{i}x\\1', 'g')) AS BIGINT) AS n_chars")
        else:
            sel.append(c)
    return f"SELECT {', '.join(sel)} FROM '{SRC}/{table}.parquet'"


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"[sf1] {t}: copied verbatim")
    for t, keys in SHIFTED.items():
        union = "\nUNION ALL\n".join(
            replica_select(con, t, keys, i) for i in range(R))
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"[sf1] {t}: x{R} -> {n} rows")


if __name__ == "__main__":
    main()
