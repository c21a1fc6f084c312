#!/usr/bin/env python3
"""Local oracle-parity checker (mimics the driver's t2 gate).

Usage: python3 tools/parity.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet result (written by graft.Verify), runs the
matching SQL from <out>/oracle_sql.json in DuckDB against the same parquet
tables, and compares: row count, column names (sorted), and exact cell
values (column-name-sorted, row order as produced).
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # strict: driver hashes exact values
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if hasattr(v, "tolist"):  # numpy arrays from parquet lists
        return norm(v.tolist())
    return repr(v)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(res_dir)
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols = spark_tbl.column_names
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        sdata = spark_tbl.to_pydict()
        srows = list(zip(*[sdata[c] for c in sorted(scols)]))
        didx = [dcols.index(c) for c in sorted(dcols)]
        drows2 = [tuple(r[i] for i in didx) for r in drows]
        if len(srows) != len(drows2):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows2)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows2)):
            if tuple(norm(x) for x in sr) != tuple(norm(x) for x in dr):
                bad = (i, sr, dr)
                break
        if bad:
            i, sr, dr = bad
            print(f"FAIL {name}: row {i} differs\n  cols : {sorted(scols)}\n  spark: {sr}\n  duck : {dr}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
