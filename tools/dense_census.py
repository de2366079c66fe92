#!/usr/bin/env python3
"""Dense-corpus cap-loss adjudication (VERDICT r16 item 2): compare the
census queries' outputs between an organic corpus and its
boilerplate-planted dense variant, against the CLOSED-FORM planted
contribution the derived-cap discipline predicts.

Usage:
  python3 tools/dense_census.py <organic_verify_dir> <dense_verify_dir> [n1 n2]

The two dirs are graft.Verify output dirs (one parquet dir per query)
for the census queries:
  g19_shingle_df_census g21_lsh_bucket_census g22_triangles
  g25_dedup_recall g26_cap_recommendation g30_winnow_dedup_recall
run at the plain corpus (gen_sf1.py boiler 0) and the dense one
(gen_sf1.py boiler "n1,n2", default 2000,400).

Predictions (stock ceilings SHINGLE/BUCKET_DF_CAP = 1000):
- group 1 (n1 = 2000 identical docs; 2400 effective inside g25/g30's
  %5-augmented corpus) sits ABOVE every ceiling -> dropped wholesale in
  every capped lane: g25/g30 lose exactly C(2400,2) pairs, g22 gains
  no edges from it.
- group 2 (n2 = 400; 480 augmented) sits BELOW the expected derived
  caps -> admitted: g25/g30 capture C(480,2) and the group stays
  intact; in the raw-corpus candidate graph it forms a 400-clique
  whose every vertex exceeds the g22 degree cap (256) -> n_hub_nodes
  +400, n_edges +C(400,2), n_wedges +400*C(399,2), and ZERO
  contribution to the capped wedge/triangle counts (the
  documented-lossy hub guard pricing its own exclusion).
- g19/g21 show the groups going IN (index health): per-band pair_mass
  +C(2000,2)+C(400,2), max_bucket = 2000; the 10 probe shingles land
  in the df-digit bins of 2000 and 400.

Exit 1 on any mismatch between predicted and measured deltas.
"""
import sys, glob, json
import duckdb

if len(sys.argv) < 3:
    sys.exit(__doc__)
ORG, DEN = sys.argv[1], sys.argv[2]
N1 = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
N2 = int(sys.argv[4]) if len(sys.argv) > 4 else 400
A = N1 + N1 // 5   # effective size inside the %5-augmented recall corpora
B = N2 + N2 // 5
C = lambda n: n * (n - 1) // 2

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
for q, lane in (("g25_dedup_recall", "LSH-bucket lane (g25)"),
                ("g30_winnow_dedup_recall", "winnow lane (g30)")):
    o, d = row1(ORG, q), row1(DEN, q)
    check(lane, "n_dup_groups delta", 2, int(d.n_dup_groups - o.n_dup_groups))
    check(lane, "n_intact_groups delta", 1,
          int(d.n_intact_groups - o.n_intact_groups))
    check(lane, f"exact_pairs delta (C({A},2)+C({B},2))", C(A) + C(B),
          int(d.exact_pairs - o.exact_pairs))
    check(lane, f"captured_pairs delta (C({B},2))", C(B),
          int(d.captured_pairs - o.captured_pairs))
    check(lane, f"lost pairs delta (C({A},2))", C(A),
          int((d.exact_pairs - d.captured_pairs)
              - (o.exact_pairs - o.captured_pairs)))

# ---- g22: hub guard on the raw-corpus candidate graph ----
o, d = row1(ORG, "g22_triangles"), row1(DEN, "g22_triangles")
check("candidate graph (g22)", "n_hub_nodes delta", N2,
      int(d.n_hub_nodes - o.n_hub_nodes))
check("candidate graph (g22)", "n_nodes delta", N2, int(d.n_nodes - o.n_nodes))
check("candidate graph (g22)", f"n_edges delta (C({N2},2))", C(N2),
      int(d.n_edges - o.n_edges))
check("candidate graph (g22)", f"n_wedges delta ({N2}*C({N2 - 1},2))",
      N2 * C(N2 - 1), int(d.n_wedges - o.n_wedges))
check("candidate graph (g22)", "n_wedges_capped delta", 0,
      int(d.n_wedges_capped - o.n_wedges_capped))
check("candidate graph (g22)", "n_triangles delta", 0,
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

# ---- g26: the derived shingle cap itself (report, no fixed prediction) ----
o, d = row1(ORG, "g26_cap_recommendation"), row1(DEN, "g26_cap_recommendation")
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
