#!/bin/bash
# Round-4 stage O: re-run the f32 b04 sweeps whose Pallas(QP/Shared)
# column changed under the qp_w_flat dispatch (occupancy gate: nq=10, 12,
# 14; nq=14 is the cell whose winner moves 66.85 -> ~73 GDOF/s,
# artifacts/wall/nq14d.log).  Temp-file + move-on-success per the round-3
# lesson.
# Usage: scripts/regen_round4r.sh [artifact root]
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

run_sweep() { # run_sweep <dest> <nq>
    local dest=$1 nq=$2
    local tmp
    tmp=$(mktemp /tmp/f32sweep.XXXXXX.log)
    log "f32 b04 nq=$nq start -> $dest"
    stamp > "$tmp"
    if timeout 7200 python -m tpu_bench.benchmarks.benchmark04 "$nq" "$nq" \
        >> "$tmp" 2>&1; then
        mv "$tmp" "$dest"
        log "f32 b04 nq=$nq done"
    else
        log "f32 b04 nq=$nq FAILED (exit $?) — left at $tmp, artifact untouched"
    fi
}

for i in 14 12 10; do
    run_sweep "$ROOT/b04/nq${i}x${i}.log" "$i"
done
log "regen_round4r complete"
