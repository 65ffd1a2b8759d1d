#!/usr/bin/env bash
# Strictly-serial finish of the round-12 fifth-decade program. Nothing
# here may overlap: the 18:12 batch-1 loss was a concurrent DuckDB
# spill starving the Spark verify of disk.
set -u
cd "$(dirname "$0")/.."

ORACLE=/tmp/oracle_sql_sf1000.json
B1_MISSING="t_lang_id t_repetition t_readability t_boilerplate t_perplexity t_url_curation d_split_leakfree d_decontaminate"
B1_ALL="t_lang_id t_repetition t_readability t_boilerplate t_perplexity t_pii_redact t_url_curation d_split_leakfree d_decontaminate s_postings"

check_one() {
  local outdir=$1 q=$2
  echo "[finish] bigcheck $q $(date +%H:%M:%S)"
  cp "$ORACLE" "$outdir/oracle_sql.json"
  if BIGCHECK_MEM=50GB python3 tools/bigcheck.py bigdata/sf1000 \
    "$outdir" "$q" "/tmp/art_${q}.json"; then
    rm -rf "$outdir/$q"
  else
    echo "[finish] bigcheck $q FAILED — dump kept"
  fi
  df -h / | tail -1
}

echo "[finish] waiting for tranche2 (batch-3 paragraph)"
while pgrep -f r12_tranche2.sh >/dev/null; do sleep 60; done

echo "[finish] 1/4 d_dedup_incremental solo $(date +%H:%M:%S)"
rm -rf /tmp/v1000_inc
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_inc \
  d_dedup_incremental >/tmp/v1000_inc.log 2>&1
check_one /tmp/v1000_inc d_dedup_incremental

echo "[finish] 2/4 batch-1 re-verify (8 missing; pii+postings dumps kept) $(date +%H:%M:%S)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_b1 \
  "$(echo $B1_MISSING | tr ' ' ',')" >>/tmp/v1000_b1.log 2>&1
for q in $B1_ALL; do check_one /tmp/v1000_b1 "$q"; done

echo "[finish] 3/4 stage legs $(date +%H:%M:%S)"
tools/r12_stage_legs.sh

echo "[finish] 4/4 done $(date +%H:%M:%S)"
