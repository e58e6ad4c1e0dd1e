#!/bin/bash
# Adversarial-content differential-fuzz gate (round 12): rebuild the
# planted-unicode corpus, run the documents-derived SQL-oracled family
# through Verify, and compare against DuckDB with check.py. The query
# list lives in graft.tools.FuzzCorpus.gateQueries (kept in one place;
# this script extracts it from the scala source to avoid drift).
set -e
cd "$(dirname "$0")/.."
BASE=${1:-/root/testdata/sf0.001}
CORPUS=${GRAFT_FUZZ_DIR:-/tmp/graft_fuzz}
OUT=${GRAFT_FUZZ_OUT:-/tmp/verify_fuzz}

QUERIES=$(sed -n '/val gateQueries/,/)$/p' src/main/scala/graft/tools/FuzzCorpus.scala \
  | grep -o '"[a-z0-9_]*"' | tr -d '"' | paste -sd,)
echo "fuzz gate queries: $QUERIES"

# GRAFT_JRUN=1: run on the compiled classes (tools/jrun.sh) so the
# gate can run beside an sbt session; needs a prior `sbt compile`.
run_main() {
  if [ "${GRAFT_JRUN:-}" = "1" ]; then tools/jrun.sh "$@"
  else sbt -batch "runMain $*"; fi
}

run_main graft.tools.FuzzCorpus "$BASE" "$CORPUS"
rm -rf "$OUT"
GRAFT_EXCLUDE_PINNED=1 SPARK_GRAFT_CPUS=32 \
  run_main graft.Verify "$CORPUS" "$OUT" "$QUERIES"
python3 tools/check.py "$CORPUS" "$OUT"
