#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query...]
Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir parquet
tables, then compares rows / schema / value-hash with columns sorted by name.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output"); n_fail += 1; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
            ora_df = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"{name}: ERROR {e}"); n_fail += 1; continue
        rows = len(spark_df) == len(ora_df)
        schema = list(spark_df.columns) == list(ora_df.columns)
        sdt = [str(t) for t in spark_df.dtypes]; odt = [str(t) for t in ora_df.dtypes]
        h = False
        if rows and schema:
            try:
                a = json.dumps(spark_df.astype(str).values.tolist())
                b = json.dumps(ora_df.astype(str).values.tolist())
                h = a == b
            except Exception as e:
                print(f"{name}: hash err {e}")
        ok = rows and schema and h
        n_pass += ok; n_fail += (not ok)
        msg = "PASS" if ok else f"FAIL rows={rows}({len(spark_df)}/{len(ora_df)}) schema={schema} hash={h}"
        if not schema and rows:
            msg += f" spark={list(spark_df.columns)}/{sdt} oracle={list(ora_df.columns)}/{odt}"
        if rows and schema and not h:
            merged = spark_df.compare(ora_df) if spark_df.shape == ora_df.shape else None
            if merged is not None and len(merged):
                msg += f"\n  first diffs:\n{merged.head(5)}"
            if sdt != odt:
                msg += f"\n  dtypes spark={sdt} oracle={odt}"
        print(f"{name}: {msg}")
    fpath = f"{out_dir}/_verify_failures.json"
    if os.path.exists(fpath):
        # oracle-keyed failures already counted above as MISSING; this
        # surfaces failures of queries with no oracle entry (rows-only ops)
        failed = {k: v for k, v in json.load(open(fpath)).items() if k not in oracle}
        for k, v in sorted(failed.items()):
            print(f"{k}: VERIFY-FAILED {v}")
        n_fail += len(failed)
    print(f"== {n_pass} pass / {n_fail} fail ==")

if __name__ == "__main__":
    main()
