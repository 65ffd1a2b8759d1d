#!/usr/bin/env bash
# Chain GenScale x10 runs for the fifth-decade probe (subset tables).
set -euo pipefail
cd "$(dirname "$0")/.."
T="documents,embeddings,events"
tools/run.sh graft.GenScale /root/testdata/sf0.1 bigdata/sf1    10 "$T"
tools/run.sh graft.GenScale bigdata/sf1         bigdata/sf10   10 "$T"
tools/run.sh graft.GenScale bigdata/sf10        bigdata/sf100  10 "$T"
tools/run.sh graft.GenScale bigdata/sf100       bigdata/sf1000 10 "$T"
echo "[genchain] done"; du -sh bigdata/sf*
