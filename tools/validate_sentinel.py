#!/usr/bin/env python3
"""Cross-regime validation of the sentinel-normalized sf10 gate
(VERDICT r17 item 2).

Replays the r16 -> r17 disk-regime flip that forced round 17's
wholesale sf10 re-record, against both gate variants:

  1. Build r16 steadies exactly like the recorder (min per query across
     the r16 pass artifacts, errors excluded).
  2. ABSOLUTE gate (the pre-r18 rule, default tol 1.5): flag every
     query whose r17 time exceeds 1.5*steady + 0.3 in EVERY r17 pass.
     This is the gate that false-flagged the whole surface in r17.
  3. NORMALIZED gate (the r18 rule in check.py): per-pass norm =
     clamp(sentinel_sec / steady-recording sentinel, 1, 10); limit =
     tol * steady * norm + 0.3. The r16/r17 artifacts predate the
     in-JVM sentinel, so each pass's norm uses the documented proxy:
     q44_also_bought (plan-unchanged r16->r17, scan+shuffle dominated
     over lineitem — the same witness the r17 adjudication used), i.e.
     norm_p = clamp(t_q44(pass p) / steady_q44(r16), 1, 10).

  4. WEIGHTED gate (the r19 rule): per-query norm_q = 1 +
     io_frac*(norm_p - 1) with the io_frac_sf10 fractions recorded in
     BENCH_BASELINE.json (tools/io_frac.py; absent queries default to
     1.0 like check.py). This is the variant that closes ADVICE r18's
     CPU-bound-query hole; it must ALSO absorb the disk flip.

Expected: the absolute gate flags a large fraction of the surface (the
false-flag storm), the normalized AND weighted gates flag ZERO — the
regime flip is absorbed by the sentinel instead of invalidating the
baseline. q44 is excluded from the flag census in every variant (as
the proxy it is normalized by construction; excluding it from the
absolute count too keeps the comparison like-for-like).

Usage: validate_sentinel.py   (reads bench/r16 and bench/r17 in-repo)
Exit 0 iff the normalized and weighted gates both report zero flags.
"""
import glob, json, os, sys

HERE = os.path.dirname(os.path.abspath(__file__))
PROXY, TOL = "q44_also_bought", 1.5


def load(pattern):
    arts = {}
    for p in sorted(glob.glob(os.path.join(HERE, "..", pattern))):
        arts[os.path.basename(p)] = json.load(open(p))
    if not arts:
        sys.exit(f"no artifacts match {pattern}")
    return arts


def times(art):
    errs = set(art.get("errors", []))
    return {q: t for q, t in art["queries"].items() if q not in errs}


# 1. r16 steadies: min per query across every r16 sf10 pass artifact
steady = {}
for a in load("bench/r16/BENCH_sf10_r16_p*_*.json").values():
    for q, t in times(a).items():
        steady[q] = min(steady.get(q, 1e18), t)

# r17 artifacts grouped by pass label (p3/p4) — the gate's multi-run
# rule needs one merged per-query map per pass
r17 = {}
for name, a in load("bench/r17/BENCH_sf10_r17_p*_*.json").items():
    p = name.split("_")[3]  # BENCH_sf10_r17_<pass>_<group>.json
    r17.setdefault(p, {}).update(times(a))
passes = sorted(r17)
if len(passes) < 2:
    sys.exit(f"need >=2 r17 passes, got {passes}")

common = set(steady)
for p in passes:
    common &= set(r17[p])
common.discard(PROXY)

# 2. absolute gate
absolute = [q for q in sorted(common)
            if all(r17[p][q] > TOL * steady[q] + 0.3 for p in passes)]

# 3. normalized gate with the q44 proxy
if PROXY not in steady:
    sys.exit(f"proxy {PROXY} missing from r16 steadies")
norm = {}
for p in passes:
    if PROXY not in r17[p]:
        sys.exit(f"proxy {PROXY} missing from r17 pass {p}")
    norm[p] = min(10.0, max(1.0, r17[p][PROXY] / steady[PROXY]))
normalized = [q for q in sorted(common)
              if all(r17[p][q] > TOL * steady[q] * norm[p] + 0.3
                     for p in passes)]

# 4. per-query io_frac-weighted gate (the r19 check.py rule)
io_frac = json.load(open(os.path.join(HERE, "..", "BENCH_BASELINE.json"))) \
    .get("io_frac_sf10", {}).get("fractions", {})
weighted = [q for q in sorted(common)
            if all(r17[p][q] > TOL * steady[q]
                   * (1.0 + io_frac.get(q, 1.0) * (norm[p] - 1.0)) + 0.3
                   for p in passes)]

print(f"r16 steadies: {len(steady)} queries; r17 passes: {passes}; "
      f"common (minus proxy): {len(common)}")
print(f"proxy {PROXY}: r16 steady {steady[PROXY]:.1f}s, r17 "
      + ", ".join(f"{p} {r17[p][PROXY]:.1f}s (norm {norm[p]:.2f})"
                  for p in passes))
print(f"ABSOLUTE   gate (pre-r18 rule): {len(absolute)} flags"
      + (f" — {absolute}" if absolute else ""))
print(f"NORMALIZED gate (r18 rule):     {len(normalized)} flags"
      + (f" — {normalized}" if normalized else ""))
print(f"WEIGHTED   gate (r19 rule, {len(io_frac)} io_fracs): "
      f"{len(weighted)} flags" + (f" — {weighted}" if weighted else ""))
sys.exit(1 if normalized or weighted else 0)
