#!/bin/bash
# Round-4 stage F (OPPORTUNISTIC, run SOLO only if wall clock allows after
# finalize): re-run the f64 b05 --step 4 sweep fully solo.  The committed
# log's tail (131072 row + the all-variant remote-compile failure at
# 524288) was measured while stage D's first sweep shared the chip; this
# decides whether 524288 is a genuine f64 compile limit (the WARNING lines
# then document it) or a contention artifact.
# Usage: scripts/regen_round4h.sh [artifact root]
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

log "f64 b05 re-run start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 8 8 8 --dtype f64 --step 4 2>&1; } \
    > "$ROOT/f64/b05/nq8x8x8.log"
log "regen_round4h complete"
