#!/bin/bash
# Round-4 stage H: re-run the bf16 b04 nq=6 sweep that stage G aborted
# (its first three minutes shared the chip with a stray single-shot
# compile check; the sweep was killed rather than left contaminated —
# see docs/round4.md).  Waits for the stage-G queue AND for the chip to
# be truly idle (no tpu_bench.benchmarks python) before starting.
# Usage: scripts/regen_round4j.sh [artifact root] [pid-to-wait-for]
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA dtype=bf16"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (stage-G queue)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
    log "PID $WAIT_PID gone"
fi
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

tmp=$(mktemp /tmp/bf16sweep.XXXXXX.log)
log "bf16 b04 nq6 re-run start"
stamp > "$tmp"
if timeout 7200 python -m tpu_bench.benchmarks.benchmark04 6 6 --dtype bf16 \
    >> "$tmp" 2>&1; then
    mv "$tmp" "$ROOT/bf16/b04/nq6x6.log"
    log "bf16 b04 nq6 done"
else
    log "bf16 b04 nq6 FAILED — left at $tmp, artifact untouched"
fi
log "regen_round4j complete"
