#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 dev/check.py /tmp/verify_out /root/testdata/sf0.01
Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf dir, and
compares row count, column names (sorted), and a hash of the values
with columns sorted by name and rows sorted.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    # normalize types: ints -> int64, floats -> float64 rounded, ts -> iso str
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.apply(lambda v: float(v) if hasattr(v, 'as_tuple') else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp_frames(a, b):
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA cols spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            bad = ~((av == bv) | (av.isna() & bv.isna()))
            if bad.any():
                i = bad.idxmax()
                return f"VAL col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                bad = av.astype(str) != bv.astype(str)
                i = bad.idxmax()
                return f"VAL col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
    return None

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    ok = fail = noora = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")]) \
            if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            noora += 1
            continue
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR {e}")
            fail += 1
            continue
        err = cmp_frames(spark_df, ora_df)
        if err:
            print(f"✗ {name}: {err}")
            fail += 1
        else:
            print(f"✓ {name} ({len(spark_df)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {noora} rows-only")
    sys.exit(1 if fail else 0)

main()
