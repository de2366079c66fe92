#!/usr/bin/env python3
"""Record per-query I/O sensitivity for the sf10 drift gate (ADVICE
r18 medium: the artifact-level sentinel ratio measures only disk
bytes/sec, yet it used to scale EVERY sf10 query's tolerance band —
in a slow-disk round a genuine compute regression on a CPU-bound query
of up to norm x passed undetected).

The sensitivity is MEASURED, not guessed, from the one recorded
disk-only regime flip this box has exhibited: r16 (steady) -> r17
(~102 MB/s cold parquet, uniform slowdown of plan-unchanged queries).
For each query and each r17 pass p:

    frac_p = clamp((t_p / steady_r16 - 1) / (norm_p - 1), 0, 1)

i.e. the share of the disk-regime slowdown the query actually
absorbed, where norm_p is the pass's sentinel ratio via the documented
q44_also_bought proxy (plan-unchanged scan+shuffle over lineitem, the
same witness validate_sentinel.py uses — r16/r17 artifacts predate the
in-JVM sentinel). The recorded fraction is the mean over passes; the
proxy itself is 1.0 by construction. check.py then widens each
query's band by 1 + frac*(norm-1) instead of the full norm.

Queries gated at sf10 but absent from the r16/r17 common set keep the
pre-r19 behavior (frac defaults to 1.0 in check.py) and are listed so
a future flip can fill them in. Deriving from a CPU-regime flip would
be wrong (the numerator would mix axes); r16->r17 is disk-pure by the
r17 adjudication (same HEAD ran FASTER at sf0.1 that round).

Usage: io_frac.py [--dry-run]   (reads bench/r16, bench/r17; writes
                                 io_frac_sf10 into BENCH_BASELINE.json)
"""
import glob, json, os, sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE = os.path.join(HERE, "..", "BENCH_BASELINE.json")
PROXY = "q44_also_bought"


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


steady = {}
for a in load("bench/r16/BENCH_sf10_r16_p*_*.json").values():
    for q, t in times(a).items():
        steady[q] = min(steady.get(q, 1e18), t)

r17 = {}
for name, a in load("bench/r17/BENCH_sf10_r17_p*_*.json").items():
    p = name.split("_")[3]
    r17.setdefault(p, {}).update(times(a))
passes = sorted(r17)

norm = {}
for p in passes:
    if PROXY not in r17[p] or PROXY not in steady:
        sys.exit(f"proxy {PROXY} missing (pass {p})")
    norm[p] = max(1.0, r17[p][PROXY] / steady[PROXY])
    if norm[p] < 1.5:
        sys.exit(f"pass {p}: proxy norm {norm[p]:.2f} < 1.5 — the flip is "
                 "too shallow to separate disk share from noise; refuse to "
                 "derive fractions from it")

fracs = {}
for q in sorted(set(steady) & set.intersection(*map(set, r17.values()))):
    if q == PROXY:
        fracs[q] = 1.0
        continue
    per_pass = [min(1.0, max(0.0, (r17[p][q] / steady[q] - 1.0)
                             / (norm[p] - 1.0))) for p in passes]
    fracs[q] = round(sum(per_pass) / len(per_pass), 3)

base = json.load(open(BASELINE))
gated = set(base.get("queries_sf10", {}))
missing = sorted(gated - set(fracs))
extra = sorted(set(fracs) - gated)
for q in extra:
    del fracs[q]

for q, f in sorted(fracs.items(), key=lambda kv: kv[1]):
    print(f"{q:36s} io_frac {f:5.3f}")
print(f"\n{len(fracs)} fractions (proxy norms: "
      + ", ".join(f"{p}={norm[p]:.2f}" for p in passes) + ")")
if missing:
    print(f"[warn] gated at sf10 but no r16/r17 flip data (check.py "
          f"defaults these to 1.0): {missing}")

if "--dry-run" in sys.argv:
    sys.exit(0)
base["io_frac_sf10"] = {
    "fractions": fracs,
    "provenance": "mean over r17 passes of clamp((t_p/steady_r16 - 1)/"
                  f"(norm_p - 1), 0, 1) with q44 proxy norms "
                  + ", ".join(f"{p}={norm[p]:.2f}" for p in passes)
                  + " — the r16->r17 disk-pure regime flip; see "
                    "tools/io_frac.py. Queries absent here gate at the "
                    "full artifact norm (frac 1.0).",
}
with open(BASELINE, "w") as f:
    json.dump(base, f, indent=1)
print(f"recorded io_frac_sf10 ({len(fracs)} queries) in BENCH_BASELINE.json")
