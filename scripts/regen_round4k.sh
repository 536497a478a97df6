#!/bin/bash
# Round-4 stage I: re-run the bf16 b04 nq=10 sweep whose first ~3 minutes
# (14:18-14:21Z) shared the chip with a stray bench.py invocation (the
# JAX_PLATFORMS=cpu env is silently ignored on this image — sitecustomize
# pre-imports jax with the TPU plugin — so a "CPU" sanity run landed on
# the chip).  Same temp-file discipline as stage G.
# Usage: scripts/regen_round4k.sh [artifact root] [pid-to-wait-for]
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA dtype=bf16"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (stage-H queue)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
    log "PID $WAIT_PID gone"
fi
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

tmp=$(mktemp /tmp/bf16sweep.XXXXXX.log)
log "bf16 b04 nq10 re-run start"
stamp > "$tmp"
if timeout 7200 python -m tpu_bench.benchmarks.benchmark04 10 10 --dtype bf16 \
    >> "$tmp" 2>&1; then
    mv "$tmp" "$ROOT/bf16/b04/nq10x10.log"
    log "bf16 b04 nq10 done"
else
    log "bf16 b04 nq10 FAILED — left at $tmp, artifact untouched"
fi
log "regen_round4k complete"
