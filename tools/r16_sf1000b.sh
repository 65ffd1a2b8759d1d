#!/usr/bin/env bash
# Round-16 retry of the disk-bound event legs under zstd compression
# (the r15 codec-only relief: ~1.5-2x smaller shuffle spill + duck
# temp, values unchanged) after trading the regenerable sf100 events
# and sf1000 documents parquets for headroom (r15 precedent —
# tools/genchain.sh rebuilds them).
set -u
cd "$(dirname "$0")/.."
export _JAVA_OPTIONS="-Dspark.io.compression.codec=zstd -Dspark.driver.maxResultSize=4g -Dspark.sql.parquet.compression.codec=zstd"

free_gb() { df --output=avail -BG / | tail -1 | tr -dc 0-9; }

run_one() {
  local q=$1 need_gb=$2
  echo "[r16b] ===== $q $(date +%H:%M:%S)"
  rm -rf "/tmp/v1000_$q" /tmp/graft_ice*
  if [ "$(free_gb)" -lt "$need_gb" ]; then
    echo "[r16b] SKIP $q — only $(free_gb)G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r16b] $q SPARK LEG FAILED"
    grep -m1 -E "Exception|No space" "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q" /tmp/graft_ice*; return
  fi
  if [ -n "$(find /tmp/v1000_$q -name _VERIFY_FAILED 2>/dev/null)" ]; then
    echo "[r16b] $q spark marker: $(head -c 200 $(find /tmp/v1000_$q -name _VERIFY_FAILED | head -1))"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=100GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_r16b_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r16b] $q VERDICT: $(tail -3 /tmp/v1000_${q}_duck.log | head -1)"
  else
    echo "[r16b] $q DUCKDB LEG FAILED"
    tail -3 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

run_one e_transitions 18
run_one e_sessionize 20
run_one e_session_window 20
run_one e_paths 20
run_one e_winsorize 24
run_one e_asof_join 24
run_one e_range_join 24
echo "[r16b] done $(date +%H:%M:%S)"
