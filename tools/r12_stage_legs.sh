#!/usr/bin/env bash
# Stage-level confirmation of the byte-growth exponent analysis
# (SCALING.md round-12): t_fingerprint and d_dedup_minhash, solo, at
# sf100 then sf1000, SPARK_GRAFT_STAGES=1 — per-stage input bytes /
# records / cpu say which stages grow with bytes (~13.3x) and which
# with rows (~10x).
set -u
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_SPILL=1 SPARK_GRAFT_STAGES=1 \
  SPARK_GRAFT_WARM_DIR=/root/testdata/sf0.001
for q in t_fingerprint d_dedup_minhash; do
  for sf in sf100 sf1000; do
    echo "[stage-legs] $q $sf $(date +%H:%M:%S)"
    SPARK_GRAFT_QUERIES=$q SPARK_GRAFT_SF_DIR=bigdata/$sf \
      tools/run.sh graft.Bench \
      >"/tmp/stage_${q}_${sf}.out" 2>"/tmp/stage_${q}_${sf}.err"
  done
done
echo "[stage-legs] done $(date +%H:%M:%S)"
