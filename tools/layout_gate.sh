#!/usr/bin/env bash
# Layout-differential gate: the whole query surface, run twice —
# standard execution layout vs an adversarial one — must produce
# bit-identical outputs. Covers pinned AND rows-only queries (it is a
# spark-vs-spark compare, no oracle needed), so it is the one gate
# that verifies EVERY queries() entry's content is a pure function of
# the data, independent of cluster layout:
#
#   run A: local[32], shuffle.partitions=32, AQE on, auto-broadcast on,
#          whole-stage codegen on (the bench configuration)
#   run B: local[5],  shuffle.partitions=7 (prime), AQE off,
#          auto-broadcast off (explicit broadcast() hints still apply),
#          1 MiB input splits (many more scan tasks), whole-stage
#          codegen OFF (interpreted expression paths)
#
# Any diff = a layout-sensitive output: fold-order-dependent float
# aggregation, partition-index leakage, codegen/interpreted divergence,
# or split-dependent file handling. At 100 TB the layout is never the
# same twice, so layout-invariance is a correctness property, not a
# nicety.
#
# Usage: tools/layout_gate.sh [sfDir] (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
TAG="$(basename "$SF_DIR")"
OUT_A="/tmp/layout_a_${TAG}"
OUT_B="/tmp/layout_b_${TAG}"
rm -rf "$OUT_A" "$OUT_B"

echo "== run A (standard layout: local[32], aqe, codegen) =="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF_DIR $OUT_A"

echo "== run B (adversarial layout: local[5], shuffle=7, no aqe, no auto-broadcast, 1MiB splits, interpreted) =="
SPARK_GRAFT_CPUS=5 GRAFT_CONF="spark.sql.shuffle.partitions=7;spark.sql.adaptive.enabled=false;spark.sql.autoBroadcastJoinThreshold=-1;spark.sql.files.maxPartitionBytes=1048576;spark.sql.codegen.wholeStage=false;spark.default.parallelism=5" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_B"

echo "== diff =="
python3 tools/diff_runs.py "$OUT_A" "$OUT_B"
