#!/usr/bin/env python3
"""Re-cut BENCH_BASELINE.json as the per-key elementwise MIN of the existing
baseline and one or more battery BENCH_LOCAL.json files (the r13 provenance
rule: the regression gate's baseline only ever gets stricter, and only
certified load_ok=true batteries are merged).

Usage: recut_baseline.py BASELINE NEW_LOCAL [NEW_LOCAL ...]
Writes the merged baseline back to BASELINE (keys sorted for stable diffs).
"""
import json
import sys


def main() -> None:
    base_path, new_paths = sys.argv[1], sys.argv[2:]
    base = json.load(open(base_path))
    merged = dict(base)
    for p in new_paths:
        for k, v in json.load(open(p)).items():
            if v is None:
                continue
            cur = merged.get(k)
            merged[k] = float(v) if cur is None else min(float(cur), float(v))
    out = {k: merged[k] for k in sorted(merged)}
    with open(base_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"baseline keys: {len(out)}  sum: {sum(out.values()):.1f}s")


if __name__ == "__main__":
    main()
