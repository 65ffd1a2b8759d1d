#!/usr/bin/env bash
# Round-16 task: extend CORRECTNESS_sf1000 past 41 hash-exact queries
# with the cheapest unverified families (r15 verdict item 7): the
# window/dt/core queries that run on the PRESERVED sf1000 tables
# (orders, customer, nation, region, documents), then the event family
# after regenerating events at sf1000 (sf10 -> sf100 -> sf1000, the
# fact parquets were traded for disk headroom in r15). Strictly serial
# (one engine at a time — the r12 concurrent-spill lesson) and
# disk-gated per leg; every dump is removed right after its verdict.
set -u
cd "$(dirname "$0")/.."

free_gb() { df --output=avail -BG / | tail -1 | tr -dc 0-9; }

run_batch() {
  local tag=$1 qcsv=$2 need_gb=$3
  echo "[r16sf1000] ===== $tag ($qcsv) $(date +%H:%M:%S)"
  rm -rf "/tmp/v1000_$tag" /tmp/graft_ice*
  if [ "$(free_gb)" -lt "$need_gb" ]; then
    echo "[r16sf1000] SKIP $tag — only $(free_gb)G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SHUFFLE=128 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$tag" "$qcsv" \
      > "/tmp/v1000_${tag}_spark.log" 2>&1; then
    echo "[r16sf1000] $tag SPARK LEG FAILED"
    tail -5 "/tmp/v1000_${tag}_spark.log"
    rm -rf "/tmp/v1000_$tag" /tmp/graft_ice*; return
  fi
  rm -rf /tmp/graft_ice*
  if BIGCHECK_MEM=50GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$tag" "$qcsv" "/tmp/art_r16_${tag}.json" \
      > "/tmp/v1000_${tag}_duck.log" 2>&1; then
    echo "[r16sf1000] $tag VERDICT: $(cat "/tmp/art_r16_${tag}.json")"
  else
    echo "[r16sf1000] $tag DUCKDB LEG FAILED"
    tail -5 "/tmp/v1000_${tag}_duck.log"
  fi
  rm -rf "/tmp/v1000_$tag"
}

# ---- tranche A: preserved tables only --------------------------------
run_batch a1 "q_distinct,q_topk,q_conditional_agg,q_group_having,q_rollup,dt_accepted_values,dt_unique_combo,dt_not_null,dt_relationships,q_window_rank,q_tpch_q22,q_tpch_q13" 20
run_batch a2 "q_semi_join,q_anti_join,q_window_dedup" 28
run_batch a3 "q_left_join_null" 34

# ---- tranche B: regenerate events, then the event family -------------
if [ ! -d bigdata/sf100/events.parquet ]; then
  echo "[r16sf1000] generating sf100 events $(date +%H:%M:%S)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
    tools/run.sh graft.GenScale bigdata/sf10 bigdata/sf100 10 "events" \
    > /tmp/gen100e.log 2>&1 || {
      echo "[r16sf1000] GEN sf100 events FAILED"; tail -5 /tmp/gen100e.log; exit 1; }
fi
if [ ! -d bigdata/sf1000/events.parquet ]; then
  echo "[r16sf1000] generating sf1000 events $(date +%H:%M:%S)"
  if [ "$(free_gb)" -lt 30 ]; then
    echo "[r16sf1000] SKIP events gen — only $(free_gb)G free"; exit 0
  fi
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=20g \
    tools/run.sh graft.GenScale bigdata/sf100 bigdata/sf1000 10 "events" \
    > /tmp/gen1000e.log 2>&1 || {
      echo "[r16sf1000] GEN sf1000 events FAILED"; tail -5 /tmp/gen1000e.log; exit 1; }
fi
du -sh bigdata/sf1000/events.parquet

run_batch b1 "dt_freshness,e_transitions,e_sessionize,e_session_window" 25
run_batch b2 "e_sliding_count,e_paths" 25
run_batch b3 "e_asof_join" 28
run_batch b4 "e_range_join" 28
run_batch b5 "e_winsorize" 30
echo "[r16sf1000] done $(date +%H:%M:%S)"
