#!/usr/bin/env bash
# Round-17 tranche B: the documents-family queries whose ORACLES are
# per-doc scalar passes (no shingle-unnest joins) — the shapes DuckDB
# can verify at 50 M docs in minutes, chosen after tranche A showed
# the shingle-exploding oracles (d_split_leakfree, d_dsir temp >32 G;
# d_decontaminate ~2 cores x 1 h) are oracle-bounded on this box.
set -u
cd "$(dirname "$0")/.."
export _JAVA_OPTIONS="-Dspark.io.compression.codec=zstd -Dspark.driver.maxResultSize=4g -Dspark.sql.parquet.compression.codec=zstd"

free_gb() { df --output=avail -BG / | tail -1 | tr -dc 0-9; }

run_one() {
  local q=$1 need_gb=$2
  echo "[r17b] ===== $q $(date +%H:%M:%S) free=$(free_gb)G"
  rm -rf "/tmp/v1000_$q" /tmp/graft_ice*
  if [ "$(free_gb)" -lt "$need_gb" ]; then
    echo "[r17b] SKIP $q — only $(free_gb)G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r17b] $q SPARK LEG FAILED"
    grep -m1 -E "Exception|No space" "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q" /tmp/graft_ice*; return
  fi
  if [ -n "$(find /tmp/v1000_$q -name _VERIFY_FAILED 2>/dev/null)" ]; then
    echo "[r17b] $q spark marker: $(head -c 200 $(find /tmp/v1000_$q -name _VERIFY_FAILED | head -1))"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=100GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_r17_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r17b] $q VERDICT: $(tail -3 /tmp/v1000_${q}_duck.log | head -1)"
  else
    echo "[r17b] $q DUCKDB LEG FAILED"
    tail -3 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

run_one t_quality_rules 16
run_one t_repetition 16
run_one t_fingerprint_rolling 16
run_one t_length_batches 16
run_one t_shuffle_shards 16
run_one t_pack_manifest 16
run_one t_boilerplate 16
run_one d_dedup_incremental 16
run_one d_dedup_minhash 16
run_one d_dedup_cluster 16
echo "[r17b] done $(date +%H:%M:%S)"
