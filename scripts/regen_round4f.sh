#!/bin/bash
# Round-4 stage D (run SOLO after regen_round4e.sh): re-measure exactly the
# sweeps the stage-B wall experiments changed production code for, then the
# corner-order tier sweeps:
#   b04 nq=2   — kron_vpu_blocked gained the stacked bcast store + 512Ki
#                chunks (artifacts/wall/nq2wall.log variant C)
#   b05 nq=2^3 — same kernel: the losing cell, now 98% of the SAME-SESSION
#                expand8 ceiling
#   b05 nq=4^3, nq=6^3 — Pallas(Coales) tier switched to the wide-4D
#                blocked MXU kron (artifacts/wall/lo3d.log)
#   anchor     — stage A's attempt crashed before the sys.path fix
#   tiers      — bf16 corners + the high-precision nq=32 frontier
# Every other committed sweep is untouched by this round's kernel changes
# and keeps its existing solo provenance stamp.
# Usage: scripts/regen_round4f.sh [artifact root] [pid-to-wait-for]
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (stage-C f64 queue)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 10; done
    log "PID $WAIT_PID gone"
fi

log "b04 nq2 start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark04 2 2 2>&1; } \
    > "$ROOT/b04/nq2x2.log"
log "b05 nq2 start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 2 2 2 2>&1; } \
    > "$ROOT/b05/nq2x2x2.log"
log "b05 nq4 start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 4 4 4 2>&1; } \
    > "$ROOT/b05/nq4x4x4.log"
log "b05 nq6 start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 6 6 6 2>&1; } \
    > "$ROOT/b05/nq6x6x6.log"

log "anchor start"
timeout 7200 python "$HERE/anchor.py" "$ROOT/anchor"
sed -i "1i # provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA" \
    "$ROOT/anchor/anchor.log"
log "anchor done"

bash "$HERE/regen_tiers.sh" "$ROOT"
log "regen_round4f complete"
