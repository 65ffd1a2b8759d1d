#!/usr/bin/env bash
# Round-17 tranche C: the remaining sf1000 candidates after tranche B —
# the new e_range_join_slice (the family's fifth-decade evidence path),
# the multimodal family (scalar oracles over binary/metadata columns),
# chunk/tokenize expansions, and two retries with bigger budgets
# (d_dedup_incremental's shuffle spill and t_boilerplate both hit
# disk-full; a 48g heap shrinks the spill volume for the former).
set -u
cd "$(dirname "$0")/.."
export _JAVA_OPTIONS="-Dspark.io.compression.codec=zstd -Dspark.driver.maxResultSize=4g -Dspark.sql.parquet.compression.codec=zstd"

free_gb() { df --output=avail -BG / | tail -1 | tr -dc 0-9; }

run_one() {
  local q=$1 need_gb=$2 mem=${3:-24g}
  echo "[r17c] ===== $q $(date +%H:%M:%S) free=$(free_gb)G mem=$mem"
  rm -rf "/tmp/v1000_$q" /tmp/graft_ice*
  if [ "$(free_gb)" -lt "$need_gb" ]; then
    echo "[r17c] SKIP $q — only $(free_gb)G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r17c] $q SPARK LEG FAILED"
    grep -m1 -E "Exception|No space" "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q" /tmp/graft_ice*; return
  fi
  if [ -n "$(find /tmp/v1000_$q -name _VERIFY_FAILED 2>/dev/null)" ]; then
    echo "[r17c] $q spark marker: $(head -c 200 $(find /tmp/v1000_$q -name _VERIFY_FAILED | head -1))"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=100GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_r17_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r17c] $q VERDICT: $(tail -3 /tmp/v1000_${q}_duck.log | head -1)"
  else
    echo "[r17c] $q DUCKDB LEG FAILED"
    tail -3 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

run_one e_range_join_slice 20
run_one mm_dedup 16
run_one mm_features 16
run_one mm_frames 16
run_one mm_resize 16
run_one t_chunk 22
run_one t_tokenize_ids 22
run_one d_dedup_incremental 18 48g
run_one t_boilerplate 20
echo "[r17c] done $(date +%H:%M:%S)"
