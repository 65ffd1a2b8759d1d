#!/usr/bin/env bash
# Round-17 single-query retry of the sf1000 DOCUMENTS-family oracle
# tranche (r16's batched DuckDB process died without verdicts; this
# runs ONE query per Spark leg and ONE bigcheck process per oracle so
# a heavy oracle's death can't take siblings' verdicts with it).
# Ordered cheap -> heavy; per-query free-disk guard; artifacts merge
# into CORRECTNESS_sf1000.json afterwards via merge_correctness.py.
set -u
cd "$(dirname "$0")/.."
export _JAVA_OPTIONS="-Dspark.io.compression.codec=zstd -Dspark.driver.maxResultSize=4g -Dspark.sql.parquet.compression.codec=zstd"

free_gb() { df --output=avail -BG / | tail -1 | tr -dc 0-9; }

run_one() {
  local q=$1 need_gb=$2
  echo "[r17] ===== $q $(date +%H:%M:%S) free=$(free_gb)G"
  rm -rf "/tmp/v1000_$q" /tmp/graft_ice*
  if [ "$(free_gb)" -lt "$need_gb" ]; then
    echo "[r17] SKIP $q — only $(free_gb)G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r17] $q SPARK LEG FAILED"
    grep -m1 -E "Exception|No space" "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q" /tmp/graft_ice*; return
  fi
  if [ -n "$(find /tmp/v1000_$q -name _VERIFY_FAILED 2>/dev/null)" ]; then
    echo "[r17] $q spark marker: $(head -c 200 $(find /tmp/v1000_$q -name _VERIFY_FAILED | head -1))"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=100GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_r17_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r17] $q VERDICT: $(tail -3 /tmp/v1000_${q}_duck.log | head -1)"
  else
    echo "[r17] $q DUCKDB LEG FAILED"
    tail -3 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

# tranche A: small-output samplers / set ops / data tests
run_one d_split_leakfree 16
run_one d_dsir 16
run_one d_decontaminate 16
run_one d_decontaminate_attr 16
run_one d_decontaminate_bloom 16
run_one d_dedup_minhash 18
run_one d_dedup_cluster 18
run_one d_dedup_incremental 18
# tranche B: per-doc scorers (50 M small rows out)
run_one t_quality_rules 18
run_one t_boilerplate 18
run_one t_repetition 18
run_one t_fingerprint_rolling 18
run_one t_length_batches 18
run_one t_shuffle_shards 18
run_one t_pack_manifest 18
# tranche C: heavier text (segment/chunk expansions, BPE)
run_one d_dedup_paragraph 20
run_one t_chunk 22
run_one t_tokenize_ids 22
run_one t_bpe_train 20
run_one t_bpe_apply 22
run_one s_phrase 20
run_one mm_dedup 18
run_one mm_features 18
run_one mm_frames 18
run_one mm_resize 18
# tranche D: the r16 casualties, one process each, last
run_one t_perplexity 22
run_one t_quality_model 22
run_one d_dedup_oversized 20
run_one p_curation_funnel 20
run_one p_curation_pipeline 22
run_one t_novelty 24
run_one t_keywords 24
run_one d_dedup_substring 26
echo "[r17] done $(date +%H:%M:%S)"
