#!/usr/bin/env bash
# Controlled r17-vs-r18-HEAD bisect of the two solo-reproduced sf10
# leads (VERDICT r18 item 1): e5_yield_funnel (3.8x over its 2.4x
# tolerance in the r18 p5 probe) and t16_bigram_surprisal (5.0x), both
# plan-unchanged, both clean at sf0.1/sf1, both reproduced while the
# I/O sentinel read norm=1.0 — so the cause is either a CPU-side
# machine regime or a real sf10-only compute regression, and only a
# same-session A/B of the two builds can tell them apart.
#
# Protocol: two precompiled worktrees (r17 HEAD 6f14d0c, r18 HEAD
# b430cef), ABBA-interleaved solo runs of each query so a regime drift
# WITHIN the session cancels instead of loading one build's column.
# Every run is wrapped by the SAME external probes regardless of build
# (the r17 build predates the in-JVM sentinel): a raw read of
# /tmp/sf10/lineitem.parquet (disk axis; warm after run 1 — the corpus
# fits page cache, which is itself evidence: a warm-cache run that is
# still slow is not disk-bound) and a fixed-work python integer loop
# (CPU axis). Results append to bench/r19/BISECT_sf10_r19.jsonl, one
# JSON object per run.
#
# Usage: tools/bisect_sf10.sh
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=bench/r19/BISECT_sf10_r19.jsonl
mkdir -p bench/r19
W17=/tmp/r17w W18=/tmp/r18w
SF=/tmp/sf10

probe() { # -> "disk_sec cpu_sec"
  python3 - <<'EOF'
import time
t0 = time.time()
with open("/tmp/sf10/lineitem.parquet", "rb", buffering=0) as f:
    n = 0
    while True:
        b = f.read(4 << 20)
        if not b:
            break
        n += len(b)
disk = time.time() - t0
t0 = time.time()
x, acc = 0x9E3779B97F4A7C15, 0
for i in range(20_000_000):
    x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 7
    x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    acc = (acc + x) & 0xFFFFFFFFFFFFFFFF
cpu = time.time() - t0
print(f"{disk:.3f} {cpu:.3f}")
EOF
}

run() { # run <build-label> <worktree> <query>
  local label="$1" wt="$2" q="$3"
  read -r DISK CPU <<<"$(probe)"
  local log="/tmp/bisect_r19_${label}_${q}.log"
  local t0=$(date +%s)
  (cd "$wt" && SPARK_GRAFT_SF_DIR=$SF SPARK_DRIVER_MEM=64g \
     SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
     SPARK_GRAFT_PASSES=1 SPARK_GRAFT_ONLY="$q" \
     sbt -batch "runMain graft.Bench") > "$log" 2>&1
  local rc=$? t1=$(date +%s)
  # the query's own timing from the artifact line (excludes sbt startup)
  local qsec
  qsec=$(grep -o "\"$q\":[0-9.]*" "$log" | tail -1 | cut -d: -f2)
  echo "{\"build\":\"$label\",\"query\":\"$q\",\"query_sec\":${qsec:-null},\"wall_sec\":$((t1-t0)),\"rc\":$rc,\"probe_disk_sec\":$DISK,\"probe_cpu_sec\":$CPU,\"ts\":\"$(date -u +%FT%TZ)\"}" >> "$OUT"
  echo "[bisect] $label $q -> ${qsec:-FAIL} s (disk $DISK, cpu $CPU)"
}

# ABBA per query, two rounds: 8 timed runs total
run r17 $W17 e5_yield_funnel
run r18 $W18 e5_yield_funnel
run r18 $W18 t16_bigram_surprisal
run r17 $W17 t16_bigram_surprisal
run r18 $W18 e5_yield_funnel
run r17 $W17 e5_yield_funnel
run r17 $W17 t16_bigram_surprisal
run r18 $W18 t16_bigram_surprisal
echo "[bisect] done -> $OUT"
