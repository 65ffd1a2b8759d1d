#!/usr/bin/env bash
# Round-17 tranche D: the function/dialect/window/set-op inventory over
# the sf1000 tables that EXIST on this box (customer 150 M, orders
# 1.5 B, events 954 M, documents 50 M, nation/region) — none of these
# ever had a fifth-decade attempt because earlier tranches prioritized
# the operator families. Ordered cheap -> heavy; the window-frame
# retries (documented oracle-disk class) run last so their deaths
# can't starve the cheap wins.
set -u
cd "$(dirname "$0")/.."
export _JAVA_OPTIONS="-Dspark.io.compression.codec=zstd -Dspark.driver.maxResultSize=4g -Dspark.sql.parquet.compression.codec=zstd"

free_gb() { df --output=avail -BG / | tail -1 | tr -dc 0-9; }

run_one() {
  local q=$1 need_gb=$2 mem=${3:-24g}
  echo "[r17d] ===== $q $(date +%H:%M:%S) free=$(free_gb)G mem=$mem"
  rm -rf "/tmp/v1000_$q" /tmp/graft_ice*
  if [ "$(free_gb)" -lt "$need_gb" ]; then
    echo "[r17d] SKIP $q — only $(free_gb)G free (need ${need_gb}G)"
    return
  fi
  if ! SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_NO_COALESCE=1 \
      tools/run.sh graft.Verify bigdata/sf1000 "/tmp/v1000_$q" "$q" \
      > "/tmp/v1000_${q}_spark.log" 2>&1; then
    echo "[r17d] $q SPARK LEG FAILED"
    grep -m1 -E "Exception|No space" "/tmp/v1000_${q}_spark.log"
    rm -rf "/tmp/v1000_$q" /tmp/graft_ice*; return
  fi
  if [ -n "$(find /tmp/v1000_$q -name _VERIFY_FAILED 2>/dev/null)" ]; then
    echo "[r17d] $q spark marker: $(head -c 200 $(find /tmp/v1000_$q -name _VERIFY_FAILED | head -1))"
    rm -rf "/tmp/v1000_$q"; return
  fi
  if BIGCHECK_MEM=100GB python3 tools/bigcheck.py bigdata/sf1000 \
      "/tmp/v1000_$q" "$q" "/tmp/art_r17_${q}.json" \
      > "/tmp/v1000_${q}_duck.log" 2>&1; then
    echo "[r17d] $q VERDICT: $(tail -3 /tmp/v1000_${q}_duck.log | head -1)"
  else
    echo "[r17d] $q DUCKDB LEG FAILED"
    tail -3 "/tmp/v1000_${q}_duck.log"
  fi
  rm -rf "/tmp/v1000_$q"
}

# nation/region (constant-size) — instant
run_one q_fn_arrays 10
run_one q_fn_flatten 10
run_one q_fn_variant 10
run_one q_fn_variant_native 10
run_one q_listagg 10
run_one q_sql_flatten 10
run_one q_sql_variant_cast 10
# customer (150 M)
run_one q_filter_pred 14
run_one q_fn_md5 16
run_one q_fn_null_family 14
run_one q_fn_strings 16
run_one q_window_dist 16
# events (954 M)
run_one q_fn_parse_json 20
run_one q_sql_colon_path 20
run_one q_sql_colon_path_native 20
# orders (1.5 B) — aggregating / small-output shapes first
run_one q_date_spine 20
run_one q_grouping_sets 20
run_one q_sql_qualify 20
run_one q_sql_dialect_fns 20
run_one q_sql_trynum_ps 20
run_one q_pivot 20
run_one q_intersect 22
run_one q_correlated_scalar 22
run_one q_join_multi 22
run_one q_sql_tpch_q22_try 22
run_one q_fn_convert_tz 22
run_one q_fn_dates 22
run_one q_fn_object_json 22
run_one q_union_all 24
run_one q_sql_qualify_order 22
# documents (50 M) scorers / pipelines
run_one t_perplexity 20
run_one t_quality_model 20
run_one d_dedup_oversized 20
run_one d_dedup_paragraph 20
run_one s_phrase 20
run_one t_bpe_train 20
run_one t_bpe_apply 22
run_one p_rag 20
run_one p_curation_funnel 20
run_one p_curation_pipeline 22
run_one d_decontaminate_attr 20
run_one d_decontaminate_bloom 20
run_one p_pagerank 22
run_one p_triangles 22
run_one d_dedup_substring 24
# heavy tails / documented-class retries, last
run_one q_sql_corpus 24
run_one q_window_leadlag 24
run_one q_window_running 24
run_one q_window_range 24
echo "[r17d] done $(date +%H:%M:%S)"
