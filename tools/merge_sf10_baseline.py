#!/usr/bin/env python3
"""Merge sf10 bench artifacts into BENCH_BASELINE.json as `queries_sf10`.

Usage: python3 tools/merge_sf10_baseline.py artifact.json [...]

Every argument is an INPUT artifact (a graft.Bench one-line JSON); the
output always goes to BENCH_BASELINE.json in-place (ADVICE r15: the
old usage line named a phantom out.json argument, so following it
merged a stale baseline file's contents as if it were an artifact).
For queries appearing in several artifacts the MIN is kept (the
sweep-protocol aggregation); queries listed under `errors` in an
artifact contribute nothing from that artifact.
"""
import json, os, sys

base_path = "BENCH_BASELINE.json"
merged = {}
for p in sys.argv[1:]:
    art = json.load(open(p))
    # Bench-shaped only (ADVICE r16): BENCH_BASELINE.json itself has a
    # 'queries' key, so a bare key check let the exact misuse the
    # docstring warns about through; and a wrong-scale artifact would
    # silently min()-merge into the sf10 gate.
    if "queries" not in art or art.get("metric") != "total" or "sf" not in art:
        sys.exit(f"{p}: not a graft.Bench artifact "
                 "(need 'queries', metric=='total' and 'sf')")
    sf_name = os.path.basename(str(art["sf"]).rstrip("/"))
    if sf_name != "sf10":
        sys.exit(f"{p}: artifact sf is '{art['sf']}', not an sf10 run — "
                 "refusing to merge into queries_sf10")
    errs = set(art.get("errors", []))
    for q, t in art.get("queries", {}).items():
        if q in errs:
            continue
        merged[q] = min(merged.get(q, 1e18), t)

base = json.load(open(base_path))
base["queries_sf10"] = {k: merged[k] for k in sorted(merged)}
json.dump(base, open(base_path, "w"), indent=1)
print(json.dumps(base["queries_sf10"], indent=1))
