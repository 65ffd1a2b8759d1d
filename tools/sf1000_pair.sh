#!/usr/bin/env bash
# Fifth-decade paired legs: sf100 -> sf1000 back-to-back, warmed,
# spill-instrumented (the SCALING.md decade protocol).
set -euo pipefail
cd "$(dirname "$0")/.."
Q="d_dedup_exact,d_dedup_minhash,d_sample_stratified,t_quality,t_token_count,t_fingerprint,s_quantize_int8,d_dedup_embed_lsh,e_tumbling_hour,e_active_users,e_funnel"
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_SPILL=1 \
  SPARK_GRAFT_WARM_DIR=/root/testdata/sf0.001 SPARK_GRAFT_QUERIES="$Q"
SPARK_GRAFT_SF_DIR=bigdata/sf100  tools/run.sh graft.Bench > /tmp/bench_sf100_pair.out  2>/tmp/bench_sf100_pair.err
SPARK_GRAFT_SF_DIR=bigdata/sf1000 tools/run.sh graft.Bench > /tmp/bench_sf1000_pair.out 2>/tmp/bench_sf1000_pair.err
echo "[pair] done"
