#!/usr/bin/env python3
"""Update SCALE_SF100.json rows in place from a targeted decade re-run.

Usage: python3 tools/sf100update.py SCALE_SF100.json <dir_sf0.1> <dir_sf1> <dir_sf10> <dir_sf100>

Each dir holds the BENCH_LOCAL.json (wall seconds) and BENCH_IO.json
(per-query {logical_mb, disk_mb, scan_rows}) written by a
SPARK_GRAFT_ONLY sweep run at that scale. Queries present in the re-run
get fresh wall numbers, recomputed per-decade ratios, and a per-decade
"io" block; rows not re-run are left untouched. The summary is
recomputed over all rows.

The io block is the decomposition VERDICT r8 asked for: logical_mb is
the plan's read volume (grows ~10x per decade when the algorithm's IO
is linear), disk_mb is actual storage traffic (0 in the page-cache
regime, ~corpus-size when cold) — a d3 wall ratio > 12 with ~10x
logical growth and a disk_mb jump is IO-regime inflation, not
algorithmic superlinearity.
"""
import sys, json


def load(path, name):
    try:
        return json.load(open(f"{path}/{name}"))
    except FileNotFoundError:
        return {}


def main():
    scale_path = sys.argv[1]
    dirs = sys.argv[2:6]
    sfs = ["sf0.1", "sf1", "sf10", "sf100"]
    wall = {sf: load(d, "BENCH_LOCAL.json") for sf, d in zip(sfs, dirs)}
    io = {sf: load(d, "BENCH_IO.json") for sf, d in zip(sfs, dirs)}
    doc = json.load(open(scale_path))
    per = doc["per_query"]
    rerun = set().union(*(set(w) for w in wall.values()))
    for k in sorted(rerun):
        row = per.setdefault(k, {})
        # sf_cap marks a row deliberately retired from deeper decades
        # (r12 verdict ask #5: q_dedup_ngram is the uncapped oracle-parity
        # variant, swept to sf10 only; see its scale_note). Numbers beyond
        # the cap are ignored so a broad sweep can't silently re-add them.
        cap = row.get("sf_cap")
        allowed = sfs[: sfs.index(cap) + 1] if cap in sfs else sfs
        for sf in allowed:
            if wall[sf].get(k) is not None:
                row[f"{sf}_sec"] = wall[sf][k]
        decades = []
        for lo_sf, hi_sf, name in (("sf0.1", "sf1", "d1"), ("sf1", "sf10", "d2"),
                                   ("sf10", "sf100", "d3")):
            lo, hi = row.get(f"{lo_sf}_sec"), row.get(f"{hi_sf}_sec")
            if lo is not None and hi is not None and lo > 0:
                row[f"ratio_{name}"] = round(hi / lo, 2)
                decades.append(row[f"ratio_{name}"])
        a, d = row.get("sf0.1_sec"), row.get("sf100_sec")
        if a and d:
            row["ratio_1000x"] = round(d / a, 2)
            row["linear_1000x"] = row["ratio_1000x"] <= 1200.0
        row["per_decade_max"] = max(decades) if decades else None
        iorow = {sf: io[sf][k] for sf in allowed if k in io[sf]}
        if iorow:
            row["io"] = iorow
    rows = {k: v for k, v in per.items()
            if v.get("sf0.1_sec") and v.get("sf100_sec")}
    tot01 = sum(v["sf0.1_sec"] for v in rows.values())
    tot100 = sum(v["sf100_sec"] for v in rows.values())
    doc["summary"] = {
        "queries": len(rows),
        "total_sf0.1_sec": round(tot01, 3),
        "total_sf100_sec": round(tot100, 3),
        "total_ratio_1000x": round(tot100 / tot01, 2) if tot01 > 0 else None,
        "all_linear_1000x": all(v.get("linear_1000x") for v in rows.values()),
        # Provenance, not a TODO list: the rows the MOST RECENT update
        # refreshed (wall + io together). The old name "rerun_with_io" read
        # as "needs a rerun for io" and was misread exactly that way.
        "last_update_rows": sorted(rerun),
    }
    json.dump(doc, open(scale_path, "w"), indent=1)
    print(f"updated {len(rerun)} rows: {sorted(rerun)}")


if __name__ == "__main__":
    main()
