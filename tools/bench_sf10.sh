#!/usr/bin/env bash
# sf10 heavy-tier gate runner (r16): one Bench invocation per sub-family
# group (the single-box protocol — 80 GB of /tmp cannot hold the whole
# ladder's materialized tables plus any one query's transient shuffle),
# TWO separated rounds (pass1 runs every group, then pass2 does), min
# taken by tools/merge_sf10_baseline.py over all artifacts.
#
# r16 change: NO cap and NO broadcast env vars — the density-derived
# caps and the auto verify strategy are the defaults now; the only
# protocol levers left are memory and partition sizing.
#
# Usage: tools/bench_sf10.sh <pass-label>   (e.g. p1, p2)
set -euo pipefail
cd "$(dirname "$0")/.."
P="${1:?pass label required (p1/p2)}"
ROUND="${ROUND:-r17}"   # artifacts land in bench/$ROUND/ (VERDICT r16 item 6)
SF=/tmp/sf10
mkdir -p "bench/$ROUND"
run() { # run <name> <shuffle_partitions> <queries>
  local name="$1" parts="$2" only="$3"
  echo "[sf10 $P] group $name (partitions $parts)"
  SPARK_GRAFT_SF_DIR=$SF SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=24 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS="$parts" SPARK_GRAFT_PASSES=1 \
    SPARK_GRAFT_ONLY="$only" \
    sbt -batch "runMain graft.Bench" > "/tmp/sf10_${P}_${name}.log" 2>&1
  cp BENCH_FULL_latest.json "bench/$ROUND/BENCH_sf10_${ROUND}_${P}_${name}.json"
  grep -o '"errors":\[[^]]*\]' "bench/$ROUND/BENCH_sf10_${ROUND}_${P}_${name}.json" || true
}
run shingle 256 "e4_dedup_quality,g15_containment,g19_shingle_df_census,g21_lsh_bucket_census,g26_cap_recommendation,g27_winnow_jaccard,g29_bucketed_jaccard,g4_ngram_jaccard,t15_winnow,y9_winnow_candidates"
run cluster 128 "g9_pagerank,g11_cluster_reps,g22_triangles,g23_link_predict"
# settled-adjudication tier (VERDICT r17 item 5): queries that re-prove
# a RECORDED decision (g31) run at sf10 only when the plans their
# verdict depends on drifted vs the fingerprints frozen at recording —
# tools/settled_tier.py prints the stale ones (empty = skip; the
# skipped steady is carried forward by tighten_sf10.py). After
# re-recording a stale one: settled_tier.py --refresh, commit.
SETTLED="$(python3 tools/settled_tier.py)"
if [ -n "$SETTLED" ]; then
  run settled 128 "$SETTLED"
else
  echo "[sf10 $P] settled tier unchanged (plan fingerprints match) — skipped"
fi
run recall  128 "g25_dedup_recall,g30_winnow_dedup_recall,m9_phash_neardup"
run exact   128 "g14_minhash_quality,y4_jaccard_threshold,g28_winnow_recall"
run tier1   128 "g1_exact_dedup,q44_also_bought,q45_basket_lift,q47_next_purchase,q50_bucketed_revenue,t16_bigram_surprisal,t21_dsir_weights,t22_ngram_novelty,t31_pmi_collocations,t42_bpe_merges,t6_normalize_stopwords,w1_wordcount,x43_theil_sen,x52_decile_shift"
run rest    128 "e1_pipeline,e3_joint_curation,e5_yield_funnel,q18_blame_supplier,q20_dominant_supplier,t5_tfidf,x37_spearman,y7_cdc_chunks"
echo "[sf10 $P] all groups done"
