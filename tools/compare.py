#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
Compares each <verifyOutDir>/<name> spark parquet against the oracle SQL in
<verifyOutDir>/oracle_sql.json run by DuckDB over <sfDir>/*.parquet views.
Columns are sorted by name, rows sorted, values hashed like the driver.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for _, row in df.iterrows():
        for v in row:
            if isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
        h.update(b"\x00")
    return h.hexdigest()

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET threads=1")  # deterministic partial-sum order in the oracle
    for t in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out, name)
        try:
            sdf = canon(pd.concat([pd.read_parquet(p) for p in
                                   sorted(glob.glob(spark_dir + "/*.parquet"))]))
            odf = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"{name}: ERROR {e}")
            bad += 1
            continue
        rows = len(sdf) == len(odf)
        schema = list(sdf.columns) == list(odf.columns)
        hmatch = rows and schema and value_hash(sdf) == value_hash(odf)
        status = "OK" if (rows and schema and hmatch) else "FAIL"
        if status == "FAIL":
            bad += 1
        print(f"{name}: {status} rows={rows}({len(sdf)}/{len(odf)}) schema={schema} hash={hmatch}")
        if not schema:
            print(f"   spark={list(sdf.columns)}\n   oracle={list(odf.columns)}")
        if rows and schema and not hmatch:
            for c in sdf.columns:
                if not sdf[c].equals(odf[c]):
                    diff = (sdf[c] != odf[c])
                    print(f"   col '{c}' differs in {diff.sum()} rows; first: "
                          f"{sdf[c][diff].iloc[0]!r} vs {odf[c][diff].iloc[0]!r}")
    sys.exit(1 if bad else 0)

main()
