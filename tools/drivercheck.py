#!/usr/bin/env python3
"""Emulation of the DRIVER's correctness compare (stricter than check.py).

The driver (per CORRECTNESS_r01.json tracebacks) loads both sides into
pandas, sorts columns by name, sorts rows via DataFrame.sort_values over all
columns, then hashes values. That pipeline is dtype-sensitive in ways
check.py's pylist compare is not:

  * Spark parquet read via pyarrow keeps DECIMAL as decimal.Decimal objects,
    while DuckDB's .df() converts DECIMAL to float64 -> value hash differs
    even when numerically equal.
  * Array/map columns become numpy arrays -> unhashable in sort_values.

Usage: python3 tools/drivercheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, glob, json
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def normalize(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cell_hashable(v):
    return not isinstance(v, (np.ndarray, list, dict))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got = load_spark(out_dir, name)
        if got is None:
            print(f"MISSING  {name}")
            n_bad += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ORACLE_ERR {name}: {e}")
            n_bad += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"MISMATCH {name}: cols {sorted(got.columns)} vs {sorted(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"MISMATCH {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        # unhashable cells -> the driver's sort_values throws (r01 "err")
        bad_cols = [c for c in got.columns
                    if len(got) and not cell_hashable(got[c].iloc[0])]
        if bad_cols:
            print(f"UNSORTABLE {name}: array/map cols {bad_cols} break driver sort")
            n_bad += 1
            continue
        try:
            g, w = normalize(got), normalize(want)
        except Exception as e:
            print(f"SORT_ERR {name}: {e}")
            n_bad += 1
            continue
        diff = None
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                an = a is None or (isinstance(a, float) and np.isnan(a)) or a is pd.NaT
                bn = b is None or (isinstance(b, float) and np.isnan(b)) or b is pd.NaT
                if an and bn:
                    continue
                # date vs midnight-timestamp: the driver's column-level
                # astype(str) renders both as 'YYYY-MM-DD' (r01 date_funcs
                # passed with exactly this shape)
                import datetime
                if isinstance(a, datetime.date) and not isinstance(a, datetime.datetime) \
                        and isinstance(b, pd.Timestamp) and b == pd.Timestamp(a):
                    continue
                # dtype-sensitive compare: Decimal vs float mismatches the
                # driver's hash even when numerically equal
                if type(a) is not type(b) and not (
                        isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer))):
                    diff = (c, i, a, b, f"TYPE {type(a).__name__} vs {type(b).__name__}")
                    break
                if a != b:
                    diff = (c, i, a, b, "VALUE")
                    break
                # -0.0 == 0.0 numerically but differs under the driver's
                # str()/byte-level hash (r01 q_explode failure mode)
                if isinstance(a, float) and np.signbit(a) != np.signbit(b):
                    diff = (c, i, a, b, "ZEROSIGN")
                    break
                # the driver compares str() representations after sort
                if str(a) != str(b):
                    diff = (c, i, a, b, "STR")
                    break
            if diff:
                break
        if diff:
            c, i, a, b, kind = diff
            print(f"MISMATCH {name}: [{kind}] col {c} row {i}: spark={a!r} oracle={b!r}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(g)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
