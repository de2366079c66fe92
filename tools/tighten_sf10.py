#!/usr/bin/env python3
"""Re-record queries_sf10 from same-machine-state separated passes and
tighten tolerance_overrides_sf10 from the observed pass ratios
(VERDICT r16 item 3: shrink the widest overrides with more passes, not
wider bands).

Usage: tighten_sf10.py pass_artifact.json [...]

Baseline value  = min across the passes (the two-pass protocol).
Override        = observed max/min ratio across passes, +20% headroom,
                  rounded up to 0.1; dropped if it lands at or below
                  the default 1.5, capped at 2.5. The headroom may be
                  truncated by the cap (every OBSERVED pass still fits:
                  the drift rule is t <= tol*steady + 0.3 and steady is
                  the min), but an observed ratio itself above 2.5
                  means same-state passes spread wider than the gate
                  can see - that query needs more passes, not a wider
                  band: listed and exit 1.
A query erroring in EVERY artifact aborts (the gate must never be
recorded from a failing run).
"""
import json, math, os, sys

EXPECT_SF = "sf10"
DEFAULT_TOL, MAX_TOL = 1.5, 2.5

if len(sys.argv) < 2:
    sys.exit(__doc__)
vals = {}
for p in sys.argv[1:]:
    art = json.load(open(p))
    if "queries" not in art or art.get("metric") != "total" or "sf" not in art:
        sys.exit(f"{p}: not a graft.Bench artifact")
    if os.path.basename(str(art["sf"]).rstrip("/")) != EXPECT_SF:
        sys.exit(f"{p}: artifact sf is '{art['sf']}', want {EXPECT_SF}")
    errs = set(art.get("errors", []))
    for q, t in art["queries"].items():
        if q not in errs:
            vals.setdefault(q, []).append(t)

b = json.load(open("BENCH_BASELINE.json"))
too_wide = []
new_q, new_tol = {}, {}
for q, ts in sorted(vals.items()):
    lo, hi = min(ts), max(ts)
    new_q[q] = round(lo, 3)
    ratio = hi / lo if lo > 0 else 1.0
    tol = min(MAX_TOL, math.ceil(ratio * 1.2 * 10) / 10)
    if ratio > MAX_TOL:
        too_wide.append((q, round(ratio, 2)))
    if tol > DEFAULT_TOL:
        new_tol[q] = tol
    flag = " WIDE" if ratio > MAX_TOL else ""
    print(f"{q:36s} min {lo:8.1f}  max {hi:8.1f}  ratio {ratio:5.2f}"
          f"  tol {new_tol.get(q, DEFAULT_TOL):4.1f}{flag}")

b["queries_sf10"] = new_q
b["tolerance_overrides_sf10"] = new_tol
with open("BENCH_BASELINE.json", "w") as f:
    json.dump(b, f, indent=1)
print(f"\nrecorded {len(new_q)} queries, {len(new_tol)} overrides "
      f"(max {max(new_tol.values()) if new_tol else DEFAULT_TOL})")
if too_wide:
    print("PASS SPREAD > 2.5x — record more passes for:", too_wide)
    sys.exit(1)
