#!/usr/bin/env bash
# Round-15 rerun of the fifth-decade legs that hit environment
# ceilings on the first pass: zstd shuffle compression (~1.5-2x
# smaller spill footprint than lz4 on these columns — the box has
# ~40 GB of /tmp headroom next to the 22 GB sf1000 orders source) and
# a raised driver maxResultSize. The deleteInsert/applyDeletes forced
# broadcasts are FIXED in code (AQE decides now); this script only
# relaxes environment knobs, never semantics.
set -u
cd "$(dirname "$0")/.."
export _JAVA_OPTIONS="-Dspark.io.compression.codec=zstd -Dspark.driver.maxResultSize=4g -Dspark.sql.parquet.compression.codec=zstd"
# parquet zstd: the temp Iceberg tables these legs write are the other
# half of the peak footprint; codec choice never changes row values

run_one() {
  local q=$1 need_gb=$2
  echo "[r15rerun] ===== $q $(date +%H:%M:%S)"
  rm -rf /tmp/graft_ice* "/tmp/v1000_$q"
  local free_gb
  free_gb=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
  if [ "$free_gb" -lt "$need_gb" ]; then
    echo "[r15rerun] SKIP $q — only ${free_gb}G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r15rerun] $q SPARK LEG FAILED"
    grep -m1 -E "Exception|ERROR|Error" "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q" /tmp/graft_ice*; return
  fi
  rm -rf /tmp/graft_ice*
  if [ -f "/tmp/v1000_$q/$q/_VERIFY_FAILED" ]; then
    echo "[r15rerun] $q spark marker: $(head -c 300 "/tmp/v1000_$q/$q/_VERIFY_FAILED")"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=50GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_r15_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r15rerun] $q VERDICT: $(cat "/tmp/art_r15_${q}.json")"
  else
    echo "[r15rerun] $q DUCKDB LEG FAILED"
    tail -3 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

# feasibility order: eq_delete/roundtrip avoid the range shuffle whose
# ~37 GB zstd spill is what killed transforms/prune_or on this box —
# those two and cdc_diff run last behind honest disk gates
run_one m_iceberg_eq_delete 32
run_one m_iceberg_roundtrip 36
run_one m_iceberg_transforms 44
run_one m_iceberg_prune_or 44
run_one m_cdc_diff 44
echo "[r15rerun] done $(date +%H:%M:%S)"
