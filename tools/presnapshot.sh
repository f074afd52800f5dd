#!/usr/bin/env bash
# Pre-snapshot guard (VERDICT r9 #1): a surface addition must never ship
# without its regenerated artifacts. Run this before every end-of-round
# snapshot / commit that touches SparkEntry.queries.
#
# Checks, cheapest first:
#   1. bench-ref-sf01.properties keys == SparkEntry.queries.keySet
#      (BenchRefSpec) and the surface count contract (SurfaceContractSpec)
#   2. plan-counter golden snapshot covers the surface (ExplainSnapshotSpec)
#
# If 1 fails: regenerate with the SPARK_GRAFT_EMIT_REF sweep (command in
# the resource header). If 2 fails: SPARK_GRAFT_REGEN_PLAN_GOLDEN=1
# sbt 'testOnly graft.ExplainSnapshotSpec'.
set -euo pipefail
cd "$(dirname "$0")/.."
# 0. (free) the DOCUMENTED surface count must match the spec-asserted one
#    (SurfaceContractSpec itself pins the spec count == queries.size, so
#    transitively docs == code). Checked lines: README's SparkEntry row,
#    SCALING.md's methodology note, SURVEY §8's growth line.
n="$(grep -oE 'queries\.size == [0-9]+' src/test/scala/graft/SurfaceContractSpec.scala | grep -oE '[0-9]+')"
for probe in "README.md:driver contract: $n queries" \
             "docs/SCALING.md:$n as of" \
             "SURVEY.md:→ $n\\."; do
  f="${probe%%:*}"; pat="${probe#*:}"
  grep -q "$pat" "$f" || {
    echo "presnapshot: $f does not document the surface count $n (expected /$pat/)" >&2
    exit 1
  }
done
sbt 'testOnly graft.BenchRefSpec graft.BenchAliasSpec graft.SurfaceContractSpec graft.ExplainSnapshotSpec'
echo "presnapshot: surface/resource/golden all in sync"
