#!/bin/bash
# Round-4 stage M2: one follow-up sweep after stage M (regen_round4o.sh)
# drains — re-run bf16 b05 nq=10^3 fully solo.  The stage-M nq=10^3 run's
# first compile minutes briefly shared the chip with a graft-entry sanity
# check (a prepare() at 21:44Z placed small arrays on device); peaks land
# at large nelmt hours later so the numbers are unaffected, but the
# provenance contract is "solo" and the headline cell gets a clean run.
# Usage: scripts/regen_round4p.sh [artifact root] [pid-to-wait-for]
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA dtype=bf16"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (stage-M queue)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
    log "PID $WAIT_PID gone"
fi
# also wait for any surviving benchmark python (pgrep only — never kill
# by pattern)
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

tmp=$(mktemp /tmp/bf16sweep.XXXXXX.log)
log "bf16 benchmark05 10 10 10 (solo re-run) start"
stamp > "$tmp"
if timeout 7200 python -m tpu_bench.benchmarks.benchmark05 10 10 10 \
    --dtype bf16 >> "$tmp" 2>&1; then
    mv "$tmp" "$ROOT/bf16/b05/nq10x10x10.log"
    log "done -> $ROOT/bf16/b05/nq10x10x10.log"
else
    log "FAILED (exit $?) — left at $tmp, artifact untouched"
fi
log "regen_round4p complete"
