#!/usr/bin/env python3
"""Merge sf10 bench artifacts into BENCH_BASELINE.json as `queries_sf10`.

Usage: python3 tools/merge_sf10_baseline.py out.json artifact.json [...]

Each artifact is a graft.Bench one-line JSON. For queries appearing in
several artifacts the MIN is kept (the sweep-protocol aggregation);
queries listed under `errors` in an artifact contribute nothing from
that artifact. Writes the merged map into BENCH_BASELINE.json
in-place and prints it.
"""
import json, sys

base_path = "BENCH_BASELINE.json"
merged = {}
for p in sys.argv[1:]:
    art = json.load(open(p))
    errs = set(art.get("errors", []))
    for q, t in art.get("queries", {}).items():
        if q in errs:
            continue
        merged[q] = min(merged.get(q, 1e18), t)

base = json.load(open(base_path))
base["queries_sf10"] = {k: merged[k] for k in sorted(merged)}
json.dump(base, open(base_path, "w"), indent=1)
print(json.dumps(base["queries_sf10"], indent=1))
