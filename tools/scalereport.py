#!/usr/bin/env python3
"""Build SCALE_r{N}.json from per-SF BENCH_LOCAL snapshots.

Usage: python3 tools/scalereport.py <round> <sf01.json> <sf1.json> [sf10.json]

Criterion (VERDICT r4 ask #1): ~linear scaling = wall-time ratio <= ~1.2x
the data ratio on the same cores (<=12x for 10x, <=120x for 100x). Ratios
far BELOW the data ratio mean the smaller SF is overhead-dominated (fixed
job/codegen/exchange costs), i.e. per-row cost falls as data grows.
"""
import sys, json

def main():
    rnd, f01, f1 = sys.argv[1], sys.argv[2], sys.argv[3]
    f10 = sys.argv[4] if len(sys.argv) > 4 else None
    a = json.load(open(f01))
    b = json.load(open(f1))
    c = json.load(open(f10)) if f10 else {}
    out = {}
    for k in sorted(a):
        row = {"sf0.1_sec": a[k], "sf1_sec": b.get(k), "ratio_10x": None,
               "linear_10x": None}
        if b.get(k):
            row["ratio_10x"] = round(b[k] / a[k], 2)
            row["linear_10x"] = row["ratio_10x"] <= 12.0
        if c.get(k):
            row["sf10_sec"] = c[k]
            row["ratio_100x"] = round(c[k] / a[k], 2)
            row["linear_100x"] = row["ratio_100x"] <= 120.0
        out[k] = row
    # Totals over the INTERSECTION of keys only: if the sf1/sf10 snapshots
    # cover a different query subset than sf0.1, summing each file
    # independently would compare mismatched sets and silently skew the
    # total ratio (ADVICE r5).
    common_ab = sorted(set(a) & set(b))
    tot_a = sum(a[k] for k in common_ab)
    tot_b = sum(b[k] for k in common_ab)
    summary = {"queries": len(a),
               "queries_in_totals_10x": len(common_ab),
               "total_sf0.1_sec": round(tot_a, 3),
               "total_sf1_sec": round(tot_b, 3),
               "total_ratio_10x": round(tot_b / tot_a, 2),
               "all_linear_10x": all(v["linear_10x"] for v in out.values()
                                     if v["linear_10x"] is not None)}
    if c:
        common_ac = sorted(set(a) & set(c))
        tot_a_c = sum(a[k] for k in common_ac)
        tot_c = sum(c[k] for k in common_ac)
        summary["queries_in_totals_100x"] = len(common_ac)
        summary["total_sf10_sec"] = round(tot_c, 3)
        summary["total_ratio_100x"] = round(tot_c / tot_a_c, 2)
        summary["all_linear_100x"] = all(
            v.get("linear_100x") for v in out.values() if "ratio_100x" in v)
    json.dump({"summary": summary, "per_query": out},
              open(f"SCALE_r{rnd}.json", "w"), indent=1)
    print(json.dumps(summary, indent=1))
    worst = sorted(out.items(),
                   key=lambda x: -(x[1].get("ratio_100x") or x[1]["ratio_10x"] or 0))[:5]
    for k, v in worst:
        print(k, v)

if __name__ == "__main__":
    main()
