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
# A third axis (round 14): MEMORY PRESSURE. `--mem` keeps the standard
# parallelism but starves the executors — a 3 GiB heap with
# spark.memory.fraction=0.2 and force-spill thresholds low enough that
# shuffle sorts, window buffers and hash aggregates actually take
# their spill paths. Bit-identical output under --mem proves no
# operator silently depends on data staying resident (the property
# 100 TB executors cannot offer).
#
# Usage: tools/layout_gate.sh [--mem] [sfDir] (default /root/testdata/sf0.01)
# GRAFT_JRUN=1: launch Verify via tools/jrun.sh (compiled classes,
# no sbt lock) so the gate can run alongside an sbt session; requires
# a prior `sbt compile`.
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="layout"
if [ "${1:-}" = "--mem" ]; then MODE="mem"; shift; fi
SF_DIR="${1:-/root/testdata/sf0.01}"
TAG="$(basename "$SF_DIR")_${MODE}"
OUT_A="/tmp/layout_a_${TAG}"
OUT_B="/tmp/layout_b_${TAG}"
rm -rf "$OUT_A" "$OUT_B"

run_verify() {
  if [ "${GRAFT_JRUN:-}" = "1" ]; then tools/jrun.sh graft.Verify "$@"
  else sbt -batch "runMain graft.Verify $*"; fi
}

echo "== run A (standard layout: local[32], aqe, codegen) =="
SPARK_GRAFT_CPUS=32 run_verify "$SF_DIR" "$OUT_A"

if [ "$MODE" = "mem" ]; then
  echo "== run B (memory pressure: 3g heap, memory.fraction=0.2, force-spill thresholds) =="
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=3g \
    GRAFT_CONF="spark.memory.fraction=0.2;spark.shuffle.spill.numElementsForceSpillThreshold=10000;spark.sql.windowExec.buffer.spill.threshold=4096;spark.sql.sessionWindow.buffer.spill.threshold=4096;spark.sql.cartesianProductExec.buffer.spill.threshold=4096" \
    run_verify "$SF_DIR" "$OUT_B"
else
  echo "== run B (adversarial layout: local[5], shuffle=7, no aqe, no auto-broadcast, 1MiB splits, interpreted) =="
  SPARK_GRAFT_CPUS=5 GRAFT_CONF="spark.sql.shuffle.partitions=7;spark.sql.adaptive.enabled=false;spark.sql.autoBroadcastJoinThreshold=-1;spark.sql.files.maxPartitionBytes=1048576;spark.sql.codegen.wholeStage=false;spark.default.parallelism=5" \
    run_verify "$SF_DIR" "$OUT_B"
fi

echo "== diff =="
python3 tools/diff_runs.py "$OUT_A" "$OUT_B"
