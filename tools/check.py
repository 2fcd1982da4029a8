#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each query's parquet output written by `graft.Verify`, runs the
matching oracle SQL from oracle_sql.json in DuckDB (with every corpus table
registered as a view), sorts columns by name, and compares values exactly.
Prints one line per query: OK / MISMATCH / MISSING.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


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
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"MISMATCH {name}: columns {gcols} vs {wcols}")
            n_bad += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"MISMATCH {name}: rows {got.num_rows} vs {want.num_rows}")
            n_bad += 1
            continue
        g = {c: got.column(c).to_pylist() for c in gcols}
        w = {c: want.column(c).to_pylist() for c in wcols}
        bad = None
        for c in gcols:
            for i, (a, b) in enumerate(zip(g[c], w[c])):
                ca, cb = canon(a), canon(b)
                if ca != cb:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"MISMATCH {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            n_bad += 1
        else:
            print(f"OK       {name} ({got.num_rows} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
