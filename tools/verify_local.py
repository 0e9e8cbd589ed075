#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run oracle_sql.json in
DuckDB over the same parquet tables, compare against the Spark dumps in
outDir (columns sorted by name, rows sorted, exact value equality)."""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(glob.glob(f"{out_dir}/*/")):
        qname = name.rstrip("/").split("/")[-1]
        spark_df = duckdb.sql(f"SELECT * FROM '{name}*.parquet'").df()
        if qname not in oracle:
            results[qname] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracle[qname]).df()
        except Exception as e:
            results[qname] = f"ORACLE_SQL_ERROR: {e}"
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            results[qname] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
            continue
        if len(s) != len(d):
            results[qname] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(d)}"
            continue
        dtype_note = ""
        for c in s.columns:
            if str(s[c].dtype) != str(d[c].dtype):
                dtype_note += f" dtype[{c}]: spark={s[c].dtype} duck={d[c].dtype}"
        mismatch = None
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                eq = (sv == dv) | (sv.isna() & dv.isna())
            except Exception:
                eq = sv.astype(str) == dv.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                mismatch = f"VALUE_MISMATCH col={c} row={idx} spark={sv[idx]!r} duck={dv[idx]!r}"
                break
        results[qname] = (mismatch or f"OK rows={len(s)}") + dtype_note
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    ro = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        print(f"{k:24s} {v}")
    print(f"\n== {ok} OK, {ro} rows-only, {len(results)-ok-ro} FAILING of {len(results)}")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
