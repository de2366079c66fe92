#!/usr/bin/env python3
"""Local correctness check mimicking the driver's DuckDB oracle compare.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]

For each query in oracle_sql.json: registers every testdata table as a
DuckDB view, runs the oracle SQL, loads the Spark parquet result, sorts
columns by name (like the driver), then compares row/schema/values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name, spark_df, oracle_df):
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS mismatch: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        # The driver's hash compare rejects int64-vs-float64 even when the
        # numbers agree (r2: a2_sessionize et al.), but tolerates integer
        # width differences (r2: int32-vs-int64 columns all hashed equal).
        # Mirror that: fail only on an integer-vs-floating kind mismatch.
        a_int = np.issubdtype(a[c].dtype, np.integer)
        b_int = np.issubdtype(b[c].dtype, np.integer)
        a_flt = np.issubdtype(a[c].dtype, np.floating)
        b_flt = np.issubdtype(b[c].dtype, np.floating)
        if (a_int and b_flt) or (a_flt and b_int):
            return (f"DTYPE mismatch col={c}: spark={a[c].dtype} oracle={b[c].dtype} "
                    f"(driver hash compare would fail; CAST the oracle side)")
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            af = av.astype(float); bf = bv.astype(float)
            ok = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not ok.all():
                i = int(np.argmin(ok))
                d = np.nanmax(np.abs(af - bf))
                return f"VALUE mismatch col={c} row={i}: spark={av[i]!r} oracle={bv[i]!r} maxdiff={d}"
        else:
            eq = pd.Series(av).astype(str).eq(pd.Series(bv).astype(str))
            if not eq.all():
                i = int(eq.idxmin())
                return f"VALUE mismatch col={c} row={i}: spark={av[i]!r} oracle={bv[i]!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"[FAIL] unknown query name(s): {sorted(unknown)}")
        sys.exit(1)
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: {e}"); n_bad += 1; continue
        err = compare(name, spark_df, oracle_df)
        if err:
            print(f"[FAIL] {name}: {err}"); n_bad += 1
        else:
            print(f"[ ok ] {name} ({len(spark_df)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
