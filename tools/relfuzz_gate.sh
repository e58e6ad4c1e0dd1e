#!/bin/bash
# Relational/events boundary-fuzz gate (round 12): rebuild the
# planted-boundary corpus (ties, duplicate rows, filter-edge dates and
# discounts, threshold-exact sums, timestamp ties), run the
# non-documents SQL-oracled family through Verify, and compare against
# DuckDB with check.py. The query list lives in
# graft.tools.RelFuzz.gateQueries (extracted from source to avoid
# drift).
set -e
cd "$(dirname "$0")/.."
BASE=${1:-/root/testdata/sf0.001}
CORPUS=${GRAFT_RELFUZZ_DIR:-/tmp/graft_relfuzz}
OUT=${GRAFT_RELFUZZ_OUT:-/tmp/verify_relfuzz}

QUERIES=$(sed -n '/val gateQueries/,/)$/p' src/main/scala/graft/tools/RelFuzz.scala \
  | grep -o '"[a-z0-9_]*"' | tr -d '"' | sort -u | paste -sd,)
echo "relfuzz gate queries: $QUERIES"

# GRAFT_JRUN=1: run on the compiled classes (tools/jrun.sh) so the
# gate can run beside an sbt session; needs a prior `sbt compile`.
run_main() {
  if [ "${GRAFT_JRUN:-}" = "1" ]; then tools/jrun.sh "$@"
  else sbt -batch "runMain $*"; fi
}

run_main graft.tools.RelFuzz "$BASE" "$CORPUS"
rm -rf "$OUT"
GRAFT_EXCLUDE_PINNED=1 SPARK_GRAFT_CPUS=32 \
  run_main graft.Verify "$CORPUS" "$OUT" "$QUERIES"
python3 tools/check.py "$CORPUS" "$OUT"
