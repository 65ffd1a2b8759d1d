#!/usr/bin/env bash
# Round-12 tranche, resumed: the first orchestrator aborted every
# batch-1 bigcheck on a missing-table view (bigcheck.py now skips
# absent tables) and deleted the dumps — batch 1 re-verifies after
# batch 2 completes. One bigcheck at a time, dump removed only after
# its verdict is recorded.
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
    if python3 tools/bigcheck.py bigdata/sf1000 "$outdir" "$q" \
      "/tmp/art_${q}.json"; then
      rm -rf "$outdir/$q"
    else
      echo "[tranche] bigcheck $q FAILED — dump kept"
    fi
    df -h / | tail -1
  done
}

echo "[tranche2] waiting for in-flight batch-2 verify"
wait_verify
check_batch /tmp/v1000_b2 $B2 2>&1

echo "[tranche2] batch-1 re-verify $(date +%H:%M:%S)"
rm -rf /tmp/v1000_b1
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_b1 \
  "$(echo $B1 | tr ' ' ',')" >/tmp/v1000_b1.log 2>&1
check_batch /tmp/v1000_b1 $B1 2>&1

echo "[tranche2] batch-3 verify (paragraph dedup, heaviest oracle) $(date +%H:%M:%S)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_NO_COALESCE=1 \
  tools/run.sh graft.Verify bigdata/sf1000 /tmp/v1000_b3 \
  "$B3" >/tmp/v1000_b3.log 2>&1
check_batch /tmp/v1000_b3 $B3 2>&1

echo "[tranche2] done $(date +%H:%M:%S)"
