#!/usr/bin/env python3
"""Synthesize the sf10 PROBE fixture (VERDICT r8 stretch item 9): the
sf1 certification tables (/tmp/graft_sf1, themselves sf0.1 x10)
replicated x10 again with the same entity-key-shift scheme at a shift
that clears sf1's whole key space, giving ~60M lineitem rows — one
decade of scale past the r7 sf1 probe that caught the key-encoding
cliff. Document tokens get a second replica prefix (y{i}q...) so
near-dup structure stays isomorphic instead of 10 exact copies;
n_chars is recomputed. Dimension tables are byte-copied (the catalog
does not grow when the corpus does). DuckDB does the replication so
parquet PHYSICAL types survive exactly.

Usage: python3 tools/make_sf10.py [dstDir]   (default /tmp/graft_sf10)
"""
import shutil
import sys
import os

import duckdb

SRC = "/tmp/graft_sf1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
R, SHIFT = 10, 10_000_000_000

SHIFTED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],          # part/supplier catalog fixed
    "events": ["event_id", "user_id"],   # 100x density, same time window
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
            sel.append(f"regexp_replace(text, '(\\S+)', 'y{i}q\\1', 'g') AS text")
        elif table == "documents" and c == "n_chars":
            sel.append("CAST(len(regexp_replace(text, '(\\S+)', "
                       f"'y{i}q\\1', 'g')) AS BIGINT) AS n_chars")
        else:
            sel.append(c)
    return f"SELECT {', '.join(sel)} FROM '{SRC}/{table}.parquet'"


def main():
    if not os.path.exists(f"{SRC}/lineitem.parquet"):
        raise SystemExit(f"missing {SRC} — run tools/make_sf1.py first")
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"[sf10] {t}: copied verbatim")
    for t, keys in SHIFTED.items():
        union = "\nUNION ALL\n".join(
            replica_select(con, t, keys, i) for i in range(R))
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"[sf10] {t}: x{R} -> {n} rows")


if __name__ == "__main__":
    main()
