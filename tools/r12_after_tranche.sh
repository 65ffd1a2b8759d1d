#!/usr/bin/env bash
# Fires after r12_tranche2 completes: the d_dedup_incremental solo
# re-verify (its batch-2 dump hit a transient disk-full) and the
# stage-metrics legs for the exponent evidence.
set -u
cd "$(dirname "$0")/.."
while pgrep -f r12_tranche2.sh >/dev/null; do sleep 60; done

echo "[after] d_dedup_incremental solo re-verify $(date +%H:%M:%S)"
rm -rf /tmp/v1000_inc
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_inc \
  d_dedup_incremental >/tmp/v1000_inc.log 2>&1
cp /tmp/oracle_sql_sf1000.json /tmp/v1000_inc/oracle_sql.json
python3 tools/bigcheck.py bigdata/sf1000 /tmp/v1000_inc \
  d_dedup_incremental /tmp/art_d_dedup_incremental.json \
  && rm -rf /tmp/v1000_inc

echo "[after] stage legs $(date +%H:%M:%S)"
tools/r12_stage_legs.sh
echo "[after] done $(date +%H:%M:%S)"
