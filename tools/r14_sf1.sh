#!/usr/bin/env bash
# Round-14 task 3: decade evidence at sf1 for the 10 post-r10 queries
# (8 carried from the r12 list + the two new bounds/transform queries).
set -euo pipefail
cd "$(dirname "$0")/.."
Q="q_sql_tpch_q1,q_sql_tpch_q3_qualify,q_sql_tpch_q18_qualify,q_sql_tpch_q22_try,q_sql_colon_path_native,q_fn_variant_native,m_iceberg_roundtrip,m_iceberg_partitioned,m_iceberg_pruned_bounds,m_iceberg_transforms"
rm -rf /tmp/verify_sf1_r14
SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=16g \
  tools/run.sh graft.Verify bigdata/sf1 /tmp/verify_sf1_r14 "$Q"
python3 tools/check.py bigdata/sf1 /tmp/verify_sf1_r14
