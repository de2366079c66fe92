#!/usr/bin/env python3
"""Re-record a named set of queries in a BENCH_BASELINE map from the
min across bench artifacts.

Usage: rerecord_family.py <key> <q1,q2,...|ALL> artifact.json [...]

<key> is the baseline map to update (queries, queries_sf1,
queries_sf10). 'ALL' re-records every query present in the artifacts.
Queries listed under `errors` in an artifact contribute nothing from
that artifact; a query erroring in EVERY artifact aborts the record
(the gate must never be recorded from a failing run).
"""
import json, os, sys

if len(sys.argv) < 4:
    sys.exit(__doc__)
key, names_arg = sys.argv[1], sys.argv[2]
# scale each baseline map is recorded at (ADVICE r16: reject wrong-scale
# artifacts instead of silently min()-merging them into the gate)
EXPECT_SF = {"queries": "sf0.1", "queries_sf1": "sf1", "queries_sf10": "sf10"}
if key not in EXPECT_SF:
    sys.exit(f"unknown baseline map '{key}' (one of {sorted(EXPECT_SF)})")
merged, seen_err = {}, {}
for p in sys.argv[3:]:
    art = json.load(open(p))
    if "queries" not in art or art.get("metric") != "total" or "sf" not in art:
        sys.exit(f"{p}: not a graft.Bench artifact "
                 "(need 'queries', metric=='total' and 'sf')")
    sf_name = os.path.basename(str(art["sf"]).rstrip("/"))
    if sf_name != EXPECT_SF[key]:
        sys.exit(f"{p}: artifact sf is '{art['sf']}' but '{key}' records "
                 f"{EXPECT_SF[key]} runs — refusing to merge")
    errs = set(art.get("errors", []))
    for q, t in art["queries"].items():
        if q in errs:
            seen_err.setdefault(q, 0)
            seen_err[q] += 1
            continue
        merged[q] = min(merged.get(q, 1e18), t)

names = set(merged) if names_arg == "ALL" else set(
    n for n in names_arg.split(",") if n)
missing = names - set(merged)
if missing:
    bad = sorted(n for n in missing if n in seen_err)
    sys.exit(f"no clean timing for: {sorted(missing)}"
             + (f" (errored in every artifact: {bad})" if bad else ""))

base = json.load(open("BENCH_BASELINE.json"))
m = base.setdefault(key, {})
changed = []
for n in sorted(names):
    old = m.get(n)
    m[n] = merged[n]
    changed.append(f"{n}: {old} -> {merged[n]}")
base[key] = {k: m[k] for k in sorted(m)}
json.dump(base, open("BENCH_BASELINE.json", "w"), indent=1)
print("\n".join(changed))
print(f"[rerecord] {len(names)} entries updated in '{key}'")
