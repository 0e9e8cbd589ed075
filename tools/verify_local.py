#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> <sfDir> [query ...]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
first (it writes one parquet dir per query plus oracle_sql.json). Runs
each oracle SQL in DuckDB over the same parquet tables and compares
rows / schema-ish / values (columns sorted by name, rows sorted).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize float32 -> float64 via repr-preserving conversion
    for c in df.columns:
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    a, b = sys.argv[1], sys.argv[2]
    # accept either (outDir, sfDir) or the skill-documented (sfDir, outDir)
    if os.path.exists(os.path.join(a, "oracle_sql.json")):
        out_dir, sf_dir = a, b
    else:
        out_dir, sf_dir = b, a
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_noor = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(os.path.join(qdir, "*.parquet")))],
                             ignore_index=True)
        if name not in oracle:
            n_noor += 1
            print(f"  {name}: NO_ORACLE ({len(spark_df)} rows)")
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"✗ {name}: oracle SQL error: {e}")
            continue
        s, o = canon(spark_df), canon(odf)
        if list(s.columns) != list(o.columns):
            n_fail += 1
            print(f"✗ {name}: column mismatch spark={list(s.columns)} oracle={list(o.columns)}")
            continue
        if len(s) != len(o):
            n_fail += 1
            print(f"✗ {name}: row count spark={len(s)} oracle={len(o)}")
            continue
        # dtype lint: the driver's value hash is type-sensitive (int64 19525
        # vs float64 19525.0 hash-mismatch even though == is true — the
        # round-9 unimax_mixture red row). Catch kind-level divergence here
        # so a DuckDB HUGEINT/DOUBLE sum vs a Spark BIGINT can't slip past
        # the local mirror's numeric-equality fallback again.
        kind_clash = None
        for c in s.columns:
            sk, ok = s[c].dtype.kind, o[c].dtype.kind
            sk = "i" if sk == "u" else sk
            ok = "i" if ok == "u" else ok
            if sk != ok:
                kind_clash = (c, str(s[c].dtype), str(o[c].dtype))
                break
        if kind_clash:
            n_fail += 1
            c, sd, od = kind_clash
            print(f"✗ {name}: dtype kind mismatch col={c}: spark={sd} oracle={od}"
                  f" (driver hash is type-sensitive — cast the oracle output)")
            continue
        mismatch = None
        for c in s.columns:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (x, y) in enumerate(zip(sv, ov)):
                if repr(x) != repr(y):
                    # arrays/lists raise on `!=` truth-testing; fall back to repr
                    try:
                        if x == y:
                            continue
                    except Exception:
                        pass
                    mismatch = (c, i, x, y)
                    break
            if mismatch:
                break
        if mismatch:
            n_fail += 1
            c, i, x, y = mismatch
            print(f"✗ {name}: value mismatch col={c} row={i}: spark={x!r} oracle={y!r}")
        else:
            n_pass += 1
            print(f"✓ {name} ({len(s)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noor} no_oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
