#!/bin/bash
# Round-4 stage K: two wall experiments, run SOLO after stage J:
#   - exp_nq14b.py   — b04 nq=14 stage isolation (which stage of qp_w
#                      underperforms vs nq=16) + the odd-K MXU probe
#   - exp_f64ozaki.py — the split-mantissa f64 kernel's on-chip rates
#                      (split / slice-GEMM / full pipeline vs XLA f64)
# Usage: scripts/regen_round4m.sh [artifact root] [pid-to-wait-for]
set -u
ROOT=${1:-artifacts}
WAIT_PID=${2:-}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA (experiment)"; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (stage-J queue)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
    log "PID $WAIT_PID gone"
fi
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

run_exp() { # run_exp <script> <dest> [args...]
    local script=$1 dest=$2; shift 2
    local tmp
    tmp=$(mktemp /tmp/wallexp.XXXXXX.log)
    log "$script start"
    stamp > "$tmp"
    if timeout 5400 python "$HERE/../docs/experiments/$script" "$@" \
        >> "$tmp" 2>&1; then
        mv "$tmp" "$dest"
        log "$script done -> $dest"
    else
        log "$script FAILED — left at $tmp, artifact untouched"
    fi
}

run_exp exp_nq14b.py "$ROOT/wall/nq14b.log" 262144
run_exp exp_f64ozaki.py "$ROOT/wall/f64ozaki.log" 131072
log "regen_round4m complete"
