#!/bin/bash
# Round-4 stage L: re-run the two f64 BwdTrans sweeps under the new
# split-mantissa Pallas(Coales) dispatch (kernels/ozaki.py), so the
# committed f64 tier gains its first working Pallas column.  Launch ONLY
# after artifacts/wall/f64ozaki.log confirms the kernel compiles and
# beats the XLA f64 path on the chip.
# OUTCOME (2026-08-18, round4.md §9): the gate FAILED — the remote
# compile helper rejects every Pallas program under jax_enable_x64, so
# this stage was never run.  Do not launch it on this toolchain.
# Usage: scripts/regen_round4n.sh [artifact root] [pid-to-wait-for]
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA dtype=f64"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
    log "PID $WAIT_PID gone"
fi
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

run_sweep() { # run_sweep <module> <dest> <args...>
    local mod=$1 dest=$2; shift 2
    local tmp
    tmp=$(mktemp /tmp/f64sweep.XXXXXX.log)
    log "f64 $mod $* start -> $dest"
    stamp > "$tmp"
    if timeout 7200 python -m "tpu_bench.benchmarks.$mod" "$@" \
        --dtype f64 --step 4 >> "$tmp" 2>&1; then
        mv "$tmp" "$dest"
        log "f64 $mod $* done"
    else
        log "f64 $mod $* FAILED — left at $tmp, artifact untouched"
    fi
}

run_sweep benchmark04 "$ROOT/f64/b04/nq8x8.log" 8 8
run_sweep benchmark05 "$ROOT/f64/b05/nq8x8x8.log" 8 8 8
log "regen_round4n complete"
