#!/usr/bin/env bash
# Round-12 tranche, phase 2: everything that was starved of disk by the
# paragraph JVM's lingering 34 GB shuffle, re-run strictly serially.
set -u
cd "$(dirname "$0")/.."
ORACLE=/tmp/oracle_sql_sf1000.json
B1="t_lang_id t_repetition t_readability t_boilerplate t_perplexity t_url_curation d_split_leakfree d_decontaminate"

check_one() {
  local outdir=$1 q=$2
  echo "[finish2] bigcheck $q $(date +%H:%M:%S)"
  cp "$ORACLE" "$outdir/oracle_sql.json"
  if BIGCHECK_MEM=50GB python3 tools/bigcheck.py bigdata/sf1000 \
    "$outdir" "$q" "/tmp/art_${q}.json"; then
    rm -rf "$outdir/$q"
  else
    echo "[finish2] bigcheck $q FAILED — dump kept"
  fi
  df -h / | tail -1
}

while pgrep -f r12_finish.sh >/dev/null; do sleep 30; done

echo "[finish2] 1/5 s_postings check retry $(date +%H:%M:%S)"
check_one /tmp/v1000_b1 s_postings

echo "[finish2] 2/5 batch-1 8-query verify $(date +%H:%M:%S)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_b1 \
  "$(echo $B1 | tr ' ' ',')" >>/tmp/v1000_b1.log 2>&1
for q in $B1; do check_one /tmp/v1000_b1 "$q"; done

echo "[finish2] 3/5 d_dedup_incremental $(date +%H:%M:%S)"
rm -rf /tmp/v1000_inc
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_inc \
  d_dedup_incremental >/tmp/v1000_inc.log 2>&1
check_one /tmp/v1000_inc d_dedup_incremental

echo "[finish2] 4/5 d_dedup_paragraph (48g heap, 128 shuffle) $(date +%H:%M:%S)"
rm -rf /tmp/v1000_b3
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE=128 \
  SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_b3 \
  d_dedup_paragraph >/tmp/v1000_b3.log 2>&1
check_one /tmp/v1000_b3 d_dedup_paragraph

echo "[finish2] 5/5 done $(date +%H:%M:%S)"
