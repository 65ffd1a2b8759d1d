#!/usr/bin/env bash
# Round-14 task 4: extend CORRECTNESS_sf1000 beyond 22 queries.
# Strictly serial (one engine at a time — the r12 lesson: concurrent
# DuckDB spill starves Spark of disk). Bankers first, then the three
# judge-requested heavies; dumps deleted right after their verdicts.
set -u
cd "$(dirname "$0")/.."

run_one() {
  local q=$1
  echo "[r14sf1000] ===== $q $(date +%H:%M:%S)"
  df -h / | tail -1
  local free_gb
  free_gb=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
  if [ "$free_gb" -lt 18 ]; then
    echo "[r14sf1000] SKIP $q — only ${free_gb}G free"
    return
  fi
  rm -rf "/tmp/v1000_$q"
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SHUFFLE=128 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r14sf1000] $q SPARK LEG FAILED"; tail -5 "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if [ -f "/tmp/v1000_$q/$q/_VERIFY_FAILED" ]; then
    echo "[r14sf1000] $q spark marker: $(cat "/tmp/v1000_$q/$q/_VERIFY_FAILED" | head -c 300)"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=50GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_r14_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r14sf1000] $q VERDICT: $(cat "/tmp/art_r14_${q}.json")"
  else
    echo "[r14sf1000] $q DUCKDB LEG FAILED"; tail -5 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

for q in d_epoch_plan t_vocab_topk d_mixture t_pmi t_keywords t_novelty; do
  run_one "$q"
done
echo "[r14sf1000] done $(date +%H:%M:%S)"
