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

Usage: settled_tier.py                      -> stale settled queries (csv)
       settled_tier.py --refresh <query...> -> re-freeze the NAMED
                                     settled queries' fingerprints at
                                     HEAD (run after re-recording each)
       settled_tier.py --refresh            -> only legal when at most
                                     ONE entry is stale; with several,
                                     a bare refresh would mark entries
                                     you did NOT re-record as fresh,
                                     defeating the staleness gate
                                     (ADVICE r18) — name them instead.
"""
import json, os, sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE = os.path.join(HERE, "..", "BENCH_BASELINE.json")
FPS = os.path.join(HERE, "..", "PLAN_FINGERPRINTS.json")

base = json.load(open(BASELINE))
fps = json.load(open(FPS))
settled = base.get("settled_sf10", {})


def stale_of(rec):
    return [k for k, fp in rec["fingerprints"].items() if fps.get(k) != fp]


if "--refresh" in sys.argv:
    named = [a for a in sys.argv[1:] if a != "--refresh"]
    unknown = [q for q in named if q not in settled]
    if unknown:
        sys.exit(f"not in settled_sf10: {unknown}")
    if not named:
        all_stale = [q for q, rec in sorted(settled.items()) if stale_of(rec)]
        if len(all_stale) > 1:
            sys.exit("bare --refresh refused: several settled entries are "
                     f"stale ({all_stale}) and a blanket re-freeze would "
                     "mark the ones you did not re-record as fresh — name "
                     "the re-recorded one(s): --refresh <query...>")
        named = all_stale or list(settled)
    for q in named:
        rec = settled[q]
        missing = [k for k in rec["fingerprints"] if k not in fps]
        if missing:
            sys.exit(f"{q}: fingerprint keys absent from PLAN_FINGERPRINTS"
                     f".json: {missing}")
        rec["fingerprints"] = {k: fps[k] for k in rec["fingerprints"]}
    json.dump(base, open(BASELINE, "w"), indent=1)
    print(f"refroze {len(named)} settled entr{'y' if len(named)==1 else 'ies'}"
          f" at HEAD: {sorted(named)}")
    sys.exit(0)

stale = []
for q, rec in sorted(settled.items()):
    drifted = stale_of(rec)
    if drifted:
        stale.append(q)
        print(f"[stale] {q}: plan drift in {drifted}", file=sys.stderr)
print(",".join(stale))
