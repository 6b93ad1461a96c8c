#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle comparison.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark-written parquet,
run the corresponding oracle SQL from oracle_sql.json in DuckDB (with each
testdata table registered as a view), sort columns by name, and compare
values row-by-row. NOT part of the engine — driver-side tooling only.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


# The driver hashes values AFTER a pandas conversion, so int-width drift
# (INTEGER vs BIGINT) is invisible — but HUGEINT becomes float64 and the
# hash diverges even when every value is identical. This killed q_cusum /
# q_survival_km (r5), q_trending (r4), and four queries in r3. Class map:
# any type-CLASS mismatch between the Spark parquet output and the DuckDB
# oracle output is a tripwire failure, and HUGEINT is fatal outright.
_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts", "TIMESTAMP_NS": "ts",
}


def _tclass(t):
    t = str(t)
    if "HUGEINT" in t:
        return "HUGEINT"
    if t.startswith("DECIMAL"):
        return t  # scale/precision must match exactly
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return _CLASS.get(t, t)


def type_audit(con, oracle, out_dir):
    """Fail on HUGEINT in any oracle output column, and on any type-class
    mismatch vs the Spark parquet output. Run at feature freeze."""
    import os
    bad = []
    for q in sorted(oracle):
        if not os.path.isdir(f"{out_dir}/{q}"):
            continue
        try:
            orel = con.sql(oracle[q])
        except Exception as e:
            bad.append((q, "*", f"ORACLE-SQL-ERROR {e}"))
            continue
        otypes = dict(zip(orel.columns, orel.types))
        srel = con.sql(f"SELECT * FROM '{out_dir}/{q}/*.parquet' LIMIT 0")
        stypes = dict(zip(srel.columns, srel.types))
        for c, ot in otypes.items():
            oc = _tclass(ot)
            if oc == "HUGEINT":
                bad.append((q, c, f"oracle type {ot} (HUGEINT -> pandas float64 -> driver hash diverges); CAST it"))
                continue
            if c not in stypes:
                bad.append((q, c, "column missing from Spark output"))
                continue
            sc = _tclass(stypes[c])
            if oc != sc:
                bad.append((q, c, f"type-class mismatch spark={stypes[c]} oracle={ot}"))
    for q, c, msg in bad:
        print(f"TYPE-AUDIT {q:24s} {c}: {msg}")
    print(f"type_audit: {'FAIL ' + str(len(bad)) + ' violations' if bad else 'OK'} "
          f"({len(oracle)} oracles)")
    return len(bad)


def _connect(sf_dir):
    """Oracle connection with SPILL enabled: an in-memory DuckDB cannot
    spill without a temp_directory, so a large-SF oracle (sf1 probe) that
    exceeds RAM dies with OutOfMemory instead of going external. The
    explicit memory_limit leaves headroom for the pyarrow result
    buffers."""
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir, out_dir):
    import os
    con = _connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    qdirs = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_rowsonly = 0
    for q in qdirs:
        got_rel = con.execute(f"SELECT * FROM '{out_dir}/{q}/*.parquet'")
        got_cols = [c[0] for c in got_rel.description]
        got = got_rel.fetchall()
        if q not in oracle:
            status = "ROWS-ONLY" if len(got) >= 0 else "EMPTY"
            print(f"{q:24s} {status} rows={len(got)}")
            n_rowsonly += 1
            continue
        try:
            exp_rel = con.execute(oracle[q])
            exp_cols = [c[0] for c in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"{q:24s} ORACLE-SQL-ERROR: {e}")
            n_fail += 1
            # an OOM poisons the buffer pool of THIS connection — every
            # later query would fail on KB-sized allocations (observed in
            # the sf1 probe). Reconnect so one heavy oracle cannot
            # cascade into false failures for the rest of the suite.
            if "Out of Memory" in str(e):
                con.close()
                con = _connect(sf_dir)
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"{q:24s} COLUMN-MISMATCH spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        grows = [tuple(canon(r[i]) for i in gi) for r in got]
        erows = [tuple(canon(r[i]) for i in ei) for r in exp]
        if grows == erows:
            print(f"{q:24s} OK rows={len(grows)}")
            n_pass += 1
        else:
            n_fail += 1
            if len(grows) != len(erows):
                print(f"{q:24s} ROWCOUNT got={len(grows)} exp={len(erows)}")
            else:
                for i, (g, e) in enumerate(zip(grows, erows)):
                    if g != e:
                        print(f"{q:24s} VALUE row {i}:")
                        print(f"    cols:  {sorted(got_cols)}")
                        print(f"    spark: {g}")
                        print(f"    duck:  {e}")
                        break
    n_type = type_audit(con, oracle, out_dir)
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rowsonly} type_violations={n_type}")
    return 0 if n_fail == 0 and n_type == 0 else 1


def tie_audit(sf_dir, out_dir):
    """Row-order stability tripwire: run every oracle under three engine
    configurations — (threads=1, 8GB), (threads=8, 8GB), and
    (threads=8, memory_limit=300MB, forcing external/spilling sorts) —
    and fail if any returns rows in a different order: an under-specified
    ORDER BY that happens to pass today flakes under DuckDB's
    parallel/external sort tomorrow. Heavy oracles that error (e.g. OOM
    under the tight limit) are skipped in that configuration, not
    failed."""
    import os

    def connect(threads, memory_limit):
        con = duckdb.connect()
        con.execute(f"SET threads={threads}")
        con.execute(f"SET memory_limit='{memory_limit}'")
        # spill dir so the low-memory config actually runs EXTERNAL
        # sorts (the order-stability hazard) instead of dying in-memory
        con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return con

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    configs = [("t1", 1, "8GB"), ("t8", 8, "8GB"), ("t8-lowmem", 8, "300MB")]
    cons = [(name, connect(th, mem)) for name, th, mem in configs]
    unstable, skipped = [], []
    for q in sorted(oracle):
        rows_by_cfg = []
        for name, con in cons:
            try:
                rows_by_cfg.append((name, [
                    tuple(canon(v) for v in r)
                    for r in con.execute(oracle[q]).fetchall()]))
            except Exception as e:
                skipped.append((q, name, str(e)[:60]))
        if len(rows_by_cfg) < 2:
            continue
        base_name, base = rows_by_cfg[0]
        for name, rows in rows_by_cfg[1:]:
            if rows != base:
                unstable.append(q)
                print(f"TIE-AUDIT {q}: row order differs "
                      f"between {base_name} and {name}")
                break
    print(f"tie_audit: {'FAIL ' + str(unstable) if unstable else 'OK'} "
          f"({len(oracle)} oracles, {len(skipped)} config-skips)")
    for q, name, e in skipped:
        print(f"  skipped {q} [{name}]: {e}")
    return 1 if unstable else 0


if __name__ == "__main__":
    if "--tie-audit" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--tie-audit"]
        sys.exit(tie_audit(args[0], args[1]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
