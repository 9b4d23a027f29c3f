#!/usr/bin/env bash
# Fast pre-commit gate (<60 s warm): compiles main+test and runs the
# registry contracts that have historically been the thing a hurried
# commit breaks (q100/q101 landed in r11 without re-running them).
#
#   ./scripts/precommit.sh
#
# Run this before EVERY commit that touches SparkEntry.queries,
# SparkEntry.oracleSql, or Bench.coreTier. It is deliberately narrow —
# the full `sbt test` (~5 min) still gates the round; this catches the
# cheap-to-catch class of breakage in seconds.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "Test/compile" "testOnly graft.ContractSpec" 2>&1 | tail -15
