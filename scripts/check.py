#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf
parquet tables, and compares: schema (sorted column names), row count,
and a hash of all values with columns sorted by name and rows sorted.
Exit 0 iff every query matches.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to UTC-naive microseconds
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # non-UTC session TZ: Spark output is pinned UTC, so any oracle whose
    # values depend on the session timezone (to_timestamp/TIMESTAMPTZ
    # round-trips, epoch casts) fails HERE instead of only on the driver
    # (whose TZ we don't control) — the a4_resample_4h r02 regression class
    con.execute("SET TimeZone='America/Anchorage'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a directory of part files (the GenScale
            # sf1/sf10 outputs); glob the parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    # a requested name missing from oracle_sql.json is a FAILURE, not a
    # silent skip — a stale dump (e.g. after a compile error) would
    # otherwise report "0 failed" for queries that were never checked
    for name in sorted(only - set(oracle)):
        failures.append(name)
        print(f"FAIL {name}: not in oracle_sql.json (stale Verify dump?)")
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            failures.append(name); print(f"FAIL {name}: no spark output"); continue
        try:
            spark_raw = pd.concat([pd.read_parquet(f) for f in files])
            duck_raw = con.execute(sql).df()
            # tz-aware vs naive split is a schema mismatch on the driver;
            # canon() would silently mask it, so flag before normalizing
            tz_cols = [c for c in spark_raw.columns if c in duck_raw.columns
                       and pd.api.types.is_datetime64_any_dtype(spark_raw[c])
                       and pd.api.types.is_datetime64_any_dtype(duck_raw[c])
                       and ((getattr(spark_raw[c].dtype, "tz", None) is None)
                            != (getattr(duck_raw[c].dtype, "tz", None) is None))]
            if tz_cols:
                failures.append(name)
                print(f"FAIL {name}: tz-aware/naive timestamp split in cols {tz_cols}")
                continue
            spark_df = canon(spark_raw)
            duck_df = canon(duck_raw)
        except Exception as e:
            failures.append(name); print(f"FAIL {name}: {type(e).__name__}: {e}"); continue
        if list(spark_df.columns) != list(duck_df.columns):
            failures.append(name)
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            continue
        if len(spark_df) != len(duck_df):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            continue
        if spark_df.equals(duck_df):
            # equals() treats -0.0 == +0.0, but the driver byte-hashes; check sign bits
            import numpy as np
            sign_cols = []
            for c in spark_df.columns:
                if pd.api.types.is_float_dtype(spark_df[c]):
                    a, b = spark_df[c].to_numpy(), duck_df[c].to_numpy()
                    zero = (a == 0) & (b == 0)
                    if (np.signbit(a[zero]) != np.signbit(b[zero])).any():
                        sign_cols.append(c)
            if sign_cols:
                failures.append(name)
                print(f"FAIL {name}: -0.0/+0.0 sign mismatch in cols {sign_cols} (driver hash would fail)")
            else:
                print(f"ok   {name} ({len(spark_df)} rows)")
        else:
            # locate first differing cells for debugging
            failures.append(name)
            diff_cols = [c for c in spark_df.columns if not spark_df[c].equals(duck_df[c])]
            print(f"FAIL {name}: value mismatch in cols {diff_cols}")
            for c in diff_cols[:3]:
                neq = spark_df[c] != duck_df[c]
                # NaN != NaN; treat both-NaN as equal
                both_nan = spark_df[c].isna() & duck_df[c].isna()
                neq = neq & ~both_nan
                idx = list(spark_df.index[neq])[:5]
                for i in idx:
                    print(f"   [{c}] row{i}: spark={spark_df[c][i]!r} duck={duck_df[c][i]!r}")
                if not idx:
                    print(f"   [{c}] differs only in NaN representation")
    print(f"\n{len(oracle) if not only else len(only)} checked, {len(failures)} failed"
          + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
