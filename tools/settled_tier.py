#!/usr/bin/env python3
"""Settled-adjudication sf10 tier (VERDICT r17 item 5).

Some sf10 queries exist to prove a DECISION, not to time an operator —
g31_hub_guard_adjudication re-proves the recorded hub-guard outcome and
cost ~580 s of every sf10 re-record. Once the decision is recorded,
re-timing it at sf10 only earns its cost when the plans it adjudicated
could have changed. `settled_sf10` in BENCH_BASELINE.json registers
each such query with the PLAN_FINGERPRINTS.json entries its verdict
depends on (its own plan plus the graph/cluster lane it adjudicates),
frozen at the fingerprints current when its sf10 steady was recorded.

This tool prints a comma-separated list of settled queries whose
fingerprint set has drifted at HEAD — i.e. the ones bench_sf10.sh must
re-record this round. Empty output = every settled adjudication still
stands; the runner skips the tier. The sf0.1 bench row and the DuckDB
oracle for these queries stay every-round — only the sf10 RECORDING is
gated on plan change. tools/tighten_sf10.py carries a skipped settled
query's existing steady/override forward so gate coverage never
shrinks.

Usage: settled_tier.py            -> stale settled queries (csv)
       settled_tier.py --refresh  -> re-freeze every settled query's
                                     fingerprints at HEAD (run after
                                     re-recording a stale one)
"""
import json, os, sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE = os.path.join(HERE, "..", "BENCH_BASELINE.json")
FPS = os.path.join(HERE, "..", "PLAN_FINGERPRINTS.json")

base = json.load(open(BASELINE))
fps = json.load(open(FPS))
settled = base.get("settled_sf10", {})

if "--refresh" in sys.argv:
    for q, rec in settled.items():
        missing = [k for k in rec["fingerprints"] if k not in fps]
        if missing:
            sys.exit(f"{q}: fingerprint keys absent from PLAN_FINGERPRINTS"
                     f".json: {missing}")
        rec["fingerprints"] = {k: fps[k] for k in rec["fingerprints"]}
    json.dump(base, open(BASELINE, "w"), indent=1)
    print(f"refroze {len(settled)} settled entries at HEAD")
    sys.exit(0)

stale = []
for q, rec in sorted(settled.items()):
    drifted = [k for k, fp in rec["fingerprints"].items()
               if fps.get(k) != fp]
    if drifted:
        stale.append(q)
        print(f"[stale] {q}: plan drift in {drifted}", file=sys.stderr)
print(",".join(stale))
