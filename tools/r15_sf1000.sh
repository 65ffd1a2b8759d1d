#!/usr/bin/env bash
# Round-15 task: extend CORRECTNESS_sf1000 with the orders/customer
# families the fifth decade never covered (Iceberg gates, snapshot
# SCD2, CDC diff). Strictly serial — one engine at a time (the r12
# lesson: concurrent DuckDB spill starves Spark of disk) — and
# disk-gated per leg: each Iceberg gate writes a ~15-20 GB temp table
# under /tmp that is removed right after its verdict.
set -u
cd "$(dirname "$0")/.."

gen() {
  if [ ! -d bigdata/sf1000/orders.parquet ]; then
    echo "[r15sf1000] generating sf1000 orders+customer $(date +%H:%M:%S)"
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=20g \
      tools/run.sh graft.GenScale bigdata/sf100 bigdata/sf1000 10 \
      "orders,customer" > /tmp/gen1000.log 2>&1 || {
        echo "[r15sf1000] GENSCALE FAILED"; tail -5 /tmp/gen1000.log; exit 1; }
  fi
  du -sh bigdata/sf1000/*.parquet
}

run_one() {
  local q=$1 need_gb=$2
  echo "[r15sf1000] ===== $q $(date +%H:%M:%S)"
  rm -rf /tmp/graft_ice* "/tmp/v1000_$q"
  local free_gb
  free_gb=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
  if [ "$free_gb" -lt "$need_gb" ]; then
    echo "[r15sf1000] SKIP $q — only ${free_gb}G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SHUFFLE=128 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r15sf1000] $q SPARK LEG FAILED"; tail -5 "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q" /tmp/graft_ice*; return
  fi
  rm -rf /tmp/graft_ice*
  if [ -f "/tmp/v1000_$q/$q/_VERIFY_FAILED" ]; then
    echo "[r15sf1000] $q spark marker: $(head -c 300 "/tmp/v1000_$q/$q/_VERIFY_FAILED")"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=50GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_r15_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r15sf1000] $q VERDICT: $(cat "/tmp/art_r15_${q}.json")"
  else
    echo "[r15sf1000] $q DUCKDB LEG FAILED"; tail -5 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

gen
# cheap first (customer-only), then the single-create Iceberg gates
# (~15-20G temp each), then the multi-snapshot/heavy-join legs that
# need the most headroom
run_one m_snapshot_scd2 12
run_one m_iceberg_partitioned 24
run_one m_iceberg_pruned_bounds 24
run_one m_iceberg_prune_nulls 24
run_one m_iceberg_prune_or 26
run_one m_iceberg_transforms 26
run_one m_iceberg_manifest_prune 26
run_one m_iceberg_eq_delete 34
run_one m_iceberg_roundtrip 38
run_one m_cdc_diff 30
echo "[r15sf1000] done $(date +%H:%M:%S)"
