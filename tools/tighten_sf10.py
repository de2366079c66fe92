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
recorded from a failing run), and a re-record whose coverage SHRINKS
vs the existing queries_sf10 aborts too — pass --allow-shrink to
intentionally drop queries (e.g. a retired registry tier). Both abort
BEFORE anything is written.
"""
import json, math, os, sys

EXPECT_SF = "sf10"
DEFAULT_TOL, MAX_TOL = 1.5, 2.5

args = sys.argv[1:]
allow_shrink = "--allow-shrink" in args
args = [a for a in args if a != "--allow-shrink"]
if not args:
    sys.exit(__doc__)
vals, seen, arts = {}, set(), []
for p in args:
    art = json.load(open(p))
    arts.append(art)
    if "queries" not in art or art.get("metric") != "total" or "sf" not in art:
        sys.exit(f"{p}: not a graft.Bench artifact")
    if os.path.basename(str(art["sf"]).rstrip("/")) != EXPECT_SF:
        sys.exit(f"{p}: artifact sf is '{art['sf']}', want {EXPECT_SF}")
    errs = set(art.get("errors", []))
    for q, t in art["queries"].items():
        seen.add(q)
        if q not in errs:
            vals.setdefault(q, []).append(t)

# a query that errored in EVERY artifact has no clean timing — abort
# before any write (ADVICE r17: it was silently dropped from the gate)
all_err = sorted(seen - set(vals))
if all_err:
    sys.exit(f"no clean timing (errored in every artifact): {all_err}")

# resolve the baseline next to the repo root like check.py does, not CWD
BASELINE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "BENCH_BASELINE.json")
b = json.load(open(BASELINE))
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

# both gate-integrity checks run BEFORE the baseline is touched
# (ADVICE r17: a failed run must leave BENCH_BASELINE.json as it was)
if too_wide:
    print("PASS SPREAD > 2.5x — record more passes for:", too_wide)
    sys.exit(1)
# settled-adjudication carry (VERDICT r17 item 5): a settled query
# skipped this re-record (plan fingerprints unchanged, settled_tier.py
# said so) keeps its existing steady + override — gate coverage never
# shrinks just because the tier didn't need re-timing.
for q in b.get("settled_sf10", {}):
    if q not in new_q and q in b.get("queries_sf10", {}):
        new_q[q] = b["queries_sf10"][q]
        if q in b.get("tolerance_overrides_sf10", {}):
            new_tol[q] = b["tolerance_overrides_sf10"][q]
        print(f"{q:36s} carried forward (settled tier, plan unchanged): "
              f"steady {new_q[q]}, tol {new_tol.get(q, DEFAULT_TOL)}")
dropped = sorted(set(b.get("queries_sf10", {})) - set(new_q))
if dropped and not allow_shrink:
    sys.exit(f"coverage would shrink by {len(dropped)} queries: {dropped}"
             "\n(supply every group's pass artifacts, or --allow-shrink)")
b["queries_sf10"] = new_q
b["tolerance_overrides_sf10"] = new_tol
# record the I/O sentinel alongside the steadies it was measured with:
# min across passes, matching steady=min (queries hit their min in the
# best regime). check.py's sf10 gate scales each artifact's band by
# its sentinel_sec / this value.
sent = [a.get("sentinel_sec") for a in arts if a.get("sentinel_sec")]
if sent:
    b["sentinel_sf10"] = {
        "sec": min(sent), "file": "lineitem.parquet",
        "provenance": f"min sentinel_sec across the {len(sent)} recording "
                      "pass artifacts (in-JVM raw FileChannel read, "
                      "graft.Bench)"}
with open(BASELINE, "w") as f:
    json.dump(b, f, indent=1)
print(f"\nrecorded {len(new_q)} queries, {len(new_tol)} overrides "
      f"(max {max(new_tol.values()) if new_tol else DEFAULT_TOL})")
