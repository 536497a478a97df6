#!/bin/bash
# Reordered continuation of regen_round4d.sh: stage B (same-session
# ceilings + wall experiments) BEFORE the f64 remainder, because the
# stage-C kernel decisions depend on the wall-experiment results and chip
# time is the scarce resource this round.  Waits for the in-flight b02
# regen (PID $2) to finish first so the chip stays solo.
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (b02 regen)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 10; done
    log "PID $WAIT_PID gone"
fi

bash "$HERE/regen_round4b.sh" "$ROOT"

for n in 02 03; do
    log "f64 b$n start"
    { stamp; timeout 7200 python -m "tpu_bench.benchmarks.benchmark$n" --dtype f64 2>&1; } \
        > "$ROOT/f64/b$n/outfile.log"
done
log "f64 b04 start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark04 8 8 --dtype f64 --step 4 2>&1; } \
    > "$ROOT/f64/b04/nq8x8.log"
log "f64 b05 start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 8 8 8 --dtype f64 --step 4 2>&1; } \
    > "$ROOT/f64/b05/nq8x8x8.log"
log "regen_round4e complete"
