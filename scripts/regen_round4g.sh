#!/bin/bash
# Round-4 stage E (run SOLO after regen_round4f.sh): repair the one
# contention window of the round.  The stage-C queue shell (regen_round4e)
# died ~15 min before its final f64 b05 child exited, so stage D's first
# sweep (b04 nq=2) started while that child still held the chip:
#   - b04 nq=2  — rows measured 07:14-07:29Z shared the chip; re-run the
#                 whole sweep so the provenance header is true
#   - f64 b05   — its nelmt=131072 row landed inside the same window and
#                 the 524288 attempt failed all 11 variants (remote-compile
#                 HTTP 500) during it; re-run the whole --step 4 sweep solo
#                 to decide whether that size is a genuine f64 compile
#                 limit (then the warnings in the log document it) or a
#                 contention artifact
# Usage: scripts/regen_round4g.sh [artifact root] [pid-to-wait-for]
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (stage-D queue)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 10; done
    log "PID $WAIT_PID gone"
fi
# belt and braces: never start while any benchmark python is still up
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

log "b04 nq2 re-run start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark04 2 2 2>&1; } \
    > "$ROOT/b04/nq2x2.log"
# b05 nq=2's first minutes (07:29:45-~07:33Z) also overlapped the dying
# f64 child's final failing compiles; the losing cell deserves a fully
# clean log
log "b05 nq2 re-run start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 2 2 2 2>&1; } \
    > "$ROOT/b05/nq2x2x2.log"
log "regen_round4g complete"
# The f64 b05 re-run moved to regen_round4h.sh (opportunistic, after
# finalize): wall clock demands the committed state go clean first.
