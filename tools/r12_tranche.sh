#!/usr/bin/env bash
# Round-12 fifth-decade correctness tranche (VERDICT r11 item 6):
# bigcheck each query one at a time (the round-10 process note), rm the
# dump as soon as its verdict is recorded so the 50 M-doc dumps never
# coexist on disk.
set -u
cd "$(dirname "$0")/.."

B1="t_lang_id t_repetition t_readability t_boilerplate t_perplexity t_pii_redact t_url_curation d_split_leakfree d_decontaminate s_postings"
B2="s_bm25 d_dedup_simhash d_dedup_ngram d_dedup_incremental e_top_event e_retention e_anomaly e_histogram"
B3="d_dedup_paragraph"

wait_verify() {
  while pgrep -f "graft.Verify bigdata/sf1000" >/dev/null; do sleep 30; done
}

check_batch() {
  local outdir=$1; shift
  for q in "$@"; do
    echo "[tranche] bigcheck $q $(date +%H:%M:%S)"
    python3 tools/bigcheck.py bigdata/sf1000 "$outdir" "$q" \
      "/tmp/art_${q}.json"
    rm -rf "$outdir/$q"
    df -h / | tail -1
  done
}

echo "[tranche] waiting for batch-1 verify"
wait_verify
cp /tmp/v1000_b1/oracle_sql.json /tmp/oracle_sql_sf1000.json 2>/dev/null || true
check_batch /tmp/v1000_b1 $B1 2>&1

echo "[tranche] batch-2 verify $(date +%H:%M:%S)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_b2 \
  "$(echo $B2 | tr ' ' ',')" >/tmp/v1000_b2.log 2>&1
check_batch /tmp/v1000_b2 $B2 2>&1

echo "[tranche] batch-3 verify (paragraph dedup, heaviest oracle) $(date +%H:%M:%S)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_b3 \
  "$B3" >/tmp/v1000_b3.log 2>&1
check_batch /tmp/v1000_b3 $B3 2>&1

echo "[tranche] done $(date +%H:%M:%S)"
