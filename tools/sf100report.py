#!/usr/bin/env python3
"""Build SCALE_SF100.json: the three-decade scaling curve for the sf100
spot-run set (the 10 heaviest sf10 queries + the PrefixSum rewrites +
cheap controls).

Usage: python3 tools/sf100report.py <sf01.json> <sf1.json> <sf10.json> <sf100.json>

Per-decade ratio = wall(next SF) / wall(prev SF) on the same cores; the
linear bound per decade is 12x (10x data + 20% headroom, the SCALE_r
convention). The sf100 run uses the sweep methodology (RUNS=1 WARMUP=0),
so rows carry full JIT cost — comparable across the sweep, overstated vs
steady-state (see BENCH_NOTES).
"""
import sys, json

def main():
    f01, f1, f10, f100 = sys.argv[1:5]
    a, b, c, d = (json.load(open(f)) for f in (f01, f1, f10, f100))
    out = {}
    for k in sorted(d):
        if k not in a:
            continue
        row = {"sf0.1_sec": a[k], "sf1_sec": b.get(k), "sf10_sec": c.get(k),
               "sf100_sec": d[k]}
        decades = []
        for lo, hi, name in ((a.get(k), b.get(k), "d1"),
                             (b.get(k), c.get(k), "d2"),
                             (c.get(k), d.get(k), "d3")):
            # `is not None`, not truthiness: a 0.0 timing is a real (if
            # suspicious) measurement, not a missing one; guard the
            # division so it can never raise.
            if lo is not None and hi is not None and lo > 0:
                r = round(hi / lo, 2)
                row[f"ratio_{name}"] = r
                decades.append(r)
        row["ratio_1000x"] = round(d[k] / a[k], 2) if a[k] > 0 else None
        row["linear_1000x"] = (row["ratio_1000x"] is not None
                               and row["ratio_1000x"] <= 1200.0)
        row["per_decade_max"] = max(decades) if decades else None
        out[k] = row
    tot01 = sum(a[k] for k in out)
    tot100 = sum(d[k] for k in out)
    summary = {
        "queries": len(out),
        "total_sf0.1_sec": round(tot01, 3),
        "total_sf100_sec": round(tot100, 3),
        "total_ratio_1000x": round(tot100 / tot01, 2) if tot01 > 0 else None,
        "all_linear_1000x": all(v["linear_1000x"] for v in out.values()),
    }
    print(json.dumps({"summary": summary, "per_query": out}, indent=1))

if __name__ == "__main__":
    main()
