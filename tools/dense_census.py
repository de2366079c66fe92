#!/usr/bin/env python3
"""Dense-corpus cap-loss adjudication (VERDICT r16 item 2): compare the
census queries' outputs between an organic corpus and its
boilerplate-planted dense variant, against the CLOSED-FORM planted
contribution the derived-cap discipline predicts.

Usage:
  python3 tools/dense_census.py <organic_verify_dir> <control_verify_dir> \
      <dense_verify_dir> <organic_caps.json> <control_caps.json> \
      <dense_caps.json> [n1 n2]

The three dirs are graft.Verify output dirs (one parquet dir per
query) for the census queries:
  g19_shingle_df_census g21_lsh_bucket_census g22_triangles
  g25_dedup_recall g26_cap_recommendation g30_winnow_dedup_recall
run at the ORGANIC corpus (gen_sf1.py, no boiler arg), the CONTROL
(boiler "n1u,n2u": same planted doc count/ids, unique text per doc ->
zero planted index mass), and the DENSE one (boiler "n1,n2", default
2000,400). The caps files are graft.CapsReport's output per corpus.

Each lane compares against the baseline that is EXACT for it:
- g19/g21 (uncapped index censuses) and g22 (raw candidate graph) use
  the ORGANIC baseline. Validity for g22: the organic corpus's own
  bucket levels must admit identically under both corpora's derived
  caps — checked as organic g21 max_bucket <= min(organic, dense)
  bucket cap (hard failure otherwise). The control is NOT used here
  because its 1.2(n1+n2) extra distinct docs add minhash birthday
  collisions (~(54k)^2/2/2^30 ~ 1.4 buckets/band at sf1) — real LSH
  false-positive pairs that pollute the graph deltas by +-1 edge
  (measured: band 3 pair_mass off by exactly 1).
- g25/g30 (recall censuses over the %5-augmented corpus) use the
  CONTROL baseline: identical n_docs gives identical derived-cap
  budgets, so every organic level admits identically and the deltas
  are purely planted. Validity: each aug cap matches the control's or
  moved UP to a planted df level. Comparing against the ORGANIC
  corpus instead is off by a budget boundary: planting docs raises
  n_docs, which re-admits organic df levels just over the organic cap
  (measured at sf1: winnow aug cap 82 -> 84, +24 organically-captured
  pairs polluting the delta). The collision noise that rules the
  control out for g22 is invisible here: a false-positive candidate
  pair between two non-duplicate docs merges no exact-text group, and
  the census counts only same-group same-cluster pairs.

Predictions branch on the measured derived caps — a planted group is
dropped in a lane exactly when its effective df exceeds that lane's
cap (effective df = n inside the raw-corpus indexes g19/g21/g22, and
1.2n inside g25/g30's %5-exact-copy augmented corpora). The closed
forms per group of effective size n:
- recall censuses (g25 bucket lane / g30 winnow lane): +C(n,2) exact
  pairs always; +C(n,2) captured and +1 intact group iff admitted —
  so the lost-pair delta is EXACTLY the sum of C(n,2) over dropped
  groups, the documented-lossy contract priced to the pair. The
  control's own planted structure is (n1+n2)/5 exact PAIRS (each %5
  probe copy pairs with its unique original; df-2 keys are admitted
  and captured in every lane), subtracted from each delta.
- candidate graph (g22, raw bucket lane): an admitted group is an
  n-clique -> +n nodes, +C(n,2) edges, +n*C(n-1,2) wedges; its
  vertices are hubs iff n-1 > the triangle degree cap (256), in which
  case the hub guard excludes them all (+n hub nodes, ZERO capped
  wedges/triangles); a dropped group contributes nothing. The raw
  control plants only df-1 keys -> no edges at all.
- index health (g19/g21, uncapped): per-band pair_mass +C(n1,2)+
  C(n2,2) and max_bucket = n1; 10 probe shingles per group land in
  each group's df-digit bin.

Exit 1 on any mismatch between predicted and measured deltas.

--skip-g22-if-invalid: when the g22 organic-baseline validity check
fails STRUCTURALLY — the organic corpus's own uncapped max bucket
exceeds a derived cap, so no group sizing can make the organic
candidate graphs comparable — record the lane as skipped (with the
measured evidence) instead of aborting, and gate on the remaining
lanes. This is the sf10 situation: at 100x density the organic corpus
itself carries super-cap buckets (max 1363 vs cap ~519), which is the
very condition the derived-cap discipline exists to bound; the g22
closed forms remain proven at sf1 where the organic baseline is valid.
Without the flag the check stays a hard failure (the sf1 protocol).
"""
import sys, glob, json
import duckdb

argv = [a for a in sys.argv if a != "--skip-g22-if-invalid"]
SKIP_G22_IF_INVALID = len(argv) != len(sys.argv)
sys.argv = argv
if len(sys.argv) < 7:
    sys.exit(__doc__)
ORG, CTL, DEN, ORG_CAPS_PATH, CTL_CAPS_PATH, CAPS_PATH = sys.argv[1:7]
N1 = int(sys.argv[7]) if len(sys.argv) > 7 else 2000
N2 = int(sys.argv[8]) if len(sys.argv) > 8 else 400
# The %5 probe count below is N//5 only when 5 | N (planted doc_ids are
# consecutive from the group offset, so the true count is ceil(N/5));
# a non-multiple group size would make every recall-lane prediction off
# by one and fail with a misleading MISMATCH (ADVICE r17). Insist.
if N1 % 5 or N2 % 5:
    sys.exit(f"group sizes must be multiples of 5 (the %5 probe "
             f"predictions assume it): n1={N1} n2={N2}")
A = N1 + N1 // 5   # effective size inside the %5-augmented recall corpora
B = N2 + N2 // 5
AUGPAIRS = N1 // 5 + N2 // 5  # the control's own captured exact pairs
C = lambda n: n * (n - 1) // 2
CAPS = json.load(open(CAPS_PATH))
CTL_CAPS = json.load(open(CTL_CAPS_PATH))
ORG_CAPS = json.load(open(ORG_CAPS_PATH))
# Control validity for the recall lanes: same budgets mean every
# ORGANIC level admits identically in both corpora, so each aug cap
# either matches the control's or moved UP to a planted df level (the
# rec0 rule returns the max admitted EXISTING level, and the planted
# level is new). Anything else means a planted group shifted an
# organic boundary.
PLANTED_LEVELS = {N1, N2, A, B}
bad = {k: (CTL_CAPS[k], CAPS[k])
       for k in ("aug_bucket_cap", "aug_winnow_cap")
       if CTL_CAPS[k] != CAPS[k]
       and not (CAPS[k] in PLANTED_LEVELS and CTL_CAPS[k] < CAPS[k])}
if bad:
    sys.exit(f"control invalid — derived caps shifted beyond the planted "
             f"levels {sorted(PLANTED_LEVELS)}: {bad}\n(an organic budget "
             "boundary moved; choose different group sizes)")
DEG_CAP = 256  # Graph.DefaultTriangleDegCap

con = duckdb.connect()

def read(d, q):
    files = glob.glob(f"{d}/{q}/*.parquet")
    if not files:
        sys.exit(f"missing {q} under {d} — run graft.Verify with that query")
    return con.sql(f"SELECT * FROM read_parquet({files!r})").df()

def row1(d, q):
    df = read(d, q)
    assert len(df) == 1, f"{q}: expected 1 row, got {len(df)}"
    return df.iloc[0]

failures = []
rows = []

def check(lane, metric, predicted, measured):
    ok = predicted == measured
    rows.append((lane, metric, predicted, measured, "MATCH" if ok else "MISMATCH"))
    if not ok:
        failures.append(f"{lane}/{metric}: predicted {predicted} measured {measured}")

# ---- g25 / g30: outcome-level recall censuses (augmented corpora) ----
for q, lane, cap in (
        ("g25_dedup_recall", "LSH-bucket lane (g25)", CAPS["aug_bucket_cap"]),
        ("g30_winnow_dedup_recall", "winnow lane (g30)",
         CAPS["aug_winnow_cap"])):
    admitted = [n for n in (A, B) if n <= cap]
    dropped = [n for n in (A, B) if n > cap]
    lane = f"{lane} cap={cap}"
    o, d = row1(CTL, q), row1(DEN, q)
    check(lane, f"n_dup_groups delta (2 groups - {AUGPAIRS} ctl pairs)",
          2 - AUGPAIRS, int(d.n_dup_groups - o.n_dup_groups))
    check(lane, f"n_intact_groups delta ({len(admitted)} admitted - ctl)",
          len(admitted) - AUGPAIRS,
          int(d.n_intact_groups - o.n_intact_groups))
    check(lane, f"exact_pairs delta (C({A},2)+C({B},2)-{AUGPAIRS})",
          C(A) + C(B) - AUGPAIRS, int(d.exact_pairs - o.exact_pairs))
    check(lane, "captured_pairs delta (admitted " +
          "+".join(f"C({n},2)" for n in admitted) + f"-{AUGPAIRS})",
          sum(C(n) for n in admitted) - AUGPAIRS,
          int(d.captured_pairs - o.captured_pairs))
    check(lane, "lost pairs delta (dropped " +
          "+".join(f"C({n},2)" for n in dropped) + ")",
          sum(C(n) for n in dropped),
          int((d.exact_pairs - d.captured_pairs)
              - (o.exact_pairs - o.captured_pairs)))

# ---- g22: hub guard on the raw-corpus candidate graph ----
# organic-baseline validity: every organic bucket level must admit
# identically under both corpora's derived caps — i.e. the organic
# corpus's own largest bucket sits at or below both caps (the organic
# g21 census measures it directly)
bcap = CAPS["bucket_cap"]
org_max_bucket = int(read(ORG, "g21_lsh_bucket_census").max_bucket.max())
g22_invalid = org_max_bucket > min(bcap, ORG_CAPS["bucket_cap"])
if g22_invalid and not SKIP_G22_IF_INVALID:
    sys.exit(f"organic baseline invalid for g22: organic max bucket "
             f"{org_max_bucket} exceeds a derived cap "
             f"(organic {ORG_CAPS['bucket_cap']}, dense {bcap}) — "
             "organic candidate edges differ between the runs")
if g22_invalid:
    rows.append((f"candidate graph (g22) cap={bcap}",
                 f"SKIPPED: organic max bucket {org_max_bucket} > cap — "
                 "organic baseline structurally invalid at this density; "
                 "closed forms proven at sf1", "-", "-", "report"))
else:
    adm = [n for n in (N1, N2) if n <= bcap]  # admitted cliques in the raw graph
    o, d = row1(ORG, "g22_triangles"), row1(DEN, "g22_triangles")
    g22 = f"candidate graph (g22) cap={bcap}"
    check(g22, "n_hub_nodes delta (admitted cliques past deg 256)",
          sum(n for n in adm if n - 1 > DEG_CAP), int(d.n_hub_nodes - o.n_hub_nodes))
    check(g22, "n_nodes delta", sum(adm), int(d.n_nodes - o.n_nodes))
    check(g22, "n_edges delta", sum(C(n) for n in adm), int(d.n_edges - o.n_edges))
    check(g22, "n_wedges delta", sum(n * C(n - 1) for n in adm),
          int(d.n_wedges - o.n_wedges))
    check(g22, "n_wedges_capped delta (sub-cap cliques only)",
          sum(n * C(n - 1) for n in adm if n - 1 <= DEG_CAP),
          int(d.n_wedges_capped - o.n_wedges_capped))
    check(g22, "n_triangles delta (sub-cap cliques only)",
          sum(n * (n - 1) * (n - 2) // 6 for n in adm if n - 1 <= DEG_CAP),
          int(d.n_triangles - o.n_triangles))

# ---- g21: per-band bucket census (the planted mass going IN) ----
og, dg = read(ORG, "g21_lsh_bucket_census"), read(DEN, "g21_lsh_bucket_census")
for band in sorted(og.band):
    ob = og[og.band == band].iloc[0]
    db = dg[dg.band == band].iloc[0]
    check(f"signature index (g21) band {band}",
          f"pair_mass delta (C({N1},2)+C({N2},2))", C(N1) + C(N2),
          int(db.pair_mass - ob.pair_mass))
    check(f"signature index (g21) band {band}", "max_bucket", N1,
          int(db.max_bucket))

# ---- g19: shingle df census (probe shingles in their digit bins) ----
og, dg = read(ORG, "g19_shingle_df_census"), read(DEN, "g19_shingle_df_census")
def bin_row(df, digits):
    m = df[df.df_digits == digits]
    return (int(m.n_shingles.sum()), int(m.postings.sum()),
            int(m.pair_candidates.sum()))
for n, nm in ((N1, "group1"), (N2, "group2")):
    digs = len(str(n))
    o3, d3 = bin_row(og, digs), bin_row(dg, digs)
    check(f"shingle index (g19) df-digit {digs}",
          f"n_shingles delta ({nm}: 10 probe shingles)", 10, d3[0] - o3[0])
    check(f"shingle index (g19) df-digit {digs}",
          f"postings delta (10*{n})", 10 * n, d3[1] - o3[1])
    check(f"shingle index (g19) df-digit {digs}",
          f"pair_candidates delta (10*C({n},2))", 10 * C(n), d3[2] - o3[2])

# ---- g26: the registered shingle-cap read must equal CapsReport's ----
o, d = row1(ORG, "g26_cap_recommendation"), row1(DEN, "g26_cap_recommendation")
check("shingle cap rule (g26)", "dense recommended_cap == CapsReport",
      CAPS["shingle_cap"], int(d.recommended_cap))
rows.append(("shingle cap rule (g26)", "recommended_cap organic -> dense",
             int(o.recommended_cap), int(d.recommended_cap), "report"))

w = [max(len(str(r[i])) for r in rows) for i in range(5)]
hdr = ("lane", "metric", "predicted", "measured", "verdict")
print("| " + " | ".join(h.ljust(wi) for h, wi in zip(hdr, w)) + " |")
print("|" + "|".join("-" * (wi + 2) for wi in w) + "|")
for r in rows:
    print("| " + " | ".join(str(v).ljust(wi) for v, wi in zip(r, w)) + " |")

if failures:
    print(f"\n{len(failures)} MISMATCH(es):")
    for f in failures:
        print("  " + f)
    sys.exit(1)
print(f"\nall {len([r for r in rows if r[4] != 'report'])} predictions match")
