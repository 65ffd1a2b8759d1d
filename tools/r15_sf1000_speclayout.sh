#!/usr/bin/env bash
# Refresh representative fifth-decade Iceberg verdicts at HEAD after
# the writer switched to the spec's metadata layouts (r102 tuples,
# Appendix D binary stats) — the earlier sf1000 verdicts were taken on
# the string-form layout. Same env relief as r15_sf1000_rerun.sh.
set -u
cd "$(dirname "$0")/.."
export _JAVA_OPTIONS="-Dspark.io.compression.codec=zstd -Dspark.driver.maxResultSize=4g -Dspark.sql.parquet.compression.codec=zstd"

run_one() {
  local q=$1 need_gb=$2
  echo "[r15spec] ===== $q $(date +%H:%M:%S)"
  rm -rf /tmp/graft_ice* "/tmp/v1000_$q"
  local free_gb
  free_gb=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
  if [ "$free_gb" -lt "$need_gb" ]; then
    echo "[r15spec] SKIP $q — only ${free_gb}G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r15spec] $q SPARK LEG FAILED"
    grep -m1 -E "Exception|ERROR|Error" "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q" /tmp/graft_ice*; return
  fi
  rm -rf /tmp/graft_ice*
  if [ -f "/tmp/v1000_$q/$q/_VERIFY_FAILED" ]; then
    echo "[r15spec] $q spark marker: $(head -c 300 "/tmp/v1000_$q/$q/_VERIFY_FAILED")"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=50GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_spec1000_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r15spec] $q VERDICT: $(cat "/tmp/art_spec1000_${q}.json")"
  else
    echo "[r15spec] $q DUCKDB LEG FAILED"; tail -3 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

# one per lifecycle class: partitioned create (manifest pruning via
# binary summaries at 1.5 B rows), the equality-delete upsert chain,
# and a range-layout transform leg
run_one m_iceberg_manifest_prune 40
run_one m_iceberg_eq_delete 32
run_one m_iceberg_transforms 44
echo "[r15spec] done $(date +%H:%M:%S)"
