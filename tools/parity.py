#!/usr/bin/env python
"""Local oracle-parity checker mimicking the driver's CORRECTNESS gate.

Usage: python tools/parity.py OUTDIR SFDIR [query ...]
  OUTDIR = dir produced by `sbt "runMain graft.Verify SFDIR OUTDIR"`
  Reads OUTDIR/<name>/ parquet + OUTDIR/oracle_sql.json, runs the oracle in
  DuckDB against SFDIR parquet tables, sorts columns by name then rows, and
  compares row counts / schemas / value hashes like the driver does.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = 0
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"ROWS-ONLY {name}: spark_rows={len(spark_df)}")
            n_pass += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
            a, b = canon(spark_df), canon(duck_df)
            rows = len(a) == len(b)
            schema = list(a.columns) == list(b.columns)
            h = False
            if rows and schema:
                ha = pd.util.hash_pandas_object(a.astype(str)).sum()
                hb = pd.util.hash_pandas_object(b.astype(str)).sum()
                h = ha == hb
            if rows and schema and h:
                print(f"PASS {name}: rows={len(a)}")
                n_pass += 1
            else:
                print(f"FAIL {name}: rows={rows}({len(a)}/{len(b)}) "
                      f"schema={schema}({list(a.columns)}/{list(b.columns)}) hash={h}")
                if rows and schema and not h:
                    merged = a.astype(str).merge(b.astype(str), how="outer",
                                                 indicator=True)
                    diff = merged[merged["_merge"] != "both"]
                    print(diff.head(10).to_string())
                n_fail += 1
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
