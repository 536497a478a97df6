#!/bin/bash
# Round-4 stage J: the bf16 split-unit hybrid experiment
# (docs/experiments/exp_bf16nq10.py) at nq=10^3 and nq=8^3 — same-session
# probes + production + hybrid candidates, written as a wall artifact.
# Waits for the stage-I queue and for a truly idle chip.
# Usage: scripts/regen_round4l.sh [artifact root] [pid-to-wait-for]
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA dtype=bf16 (experiment)"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (stage-I queue)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
    log "PID $WAIT_PID gone"
fi
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

tmp=$(mktemp /tmp/bf16hybrid.XXXXXX.log)
log "exp_bf16nq10 start (nq=10 then nq=8)"
stamp > "$tmp"
ok=1
timeout 5400 python "$HERE/../docs/experiments/exp_bf16nq10.py" 524288 10 \
    >> "$tmp" 2>&1 || ok=0
timeout 5400 python "$HERE/../docs/experiments/exp_bf16nq10.py" 524288 8 \
    >> "$tmp" 2>&1 || ok=0
if [ "$ok" = 1 ]; then
    mv "$tmp" "$ROOT/wall/bf16nq10.log"
    log "experiment done -> $ROOT/wall/bf16nq10.log"
else
    log "experiment FAILED — left at $tmp, artifact untouched"
fi
log "regen_round4l complete"
