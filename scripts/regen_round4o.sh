#!/bin/bash
# Round-4 stage M: re-run the bf16 b05 sweeps under the updated
# qp_shared3d (f32 vreg accumulation of the v combine, round4.md §8), so
# every committed bf16 3D log reflects the current kernel.  Order:
# nq=10^3 first (the cell whose winner changes: 97.5 -> ~134 GDOF/s
# measured in artifacts/wall/bf16nq10.log), then 8^3, 6^3, 4^3, 2^3.
# Each sweep writes to a temp file and moves into the artifact tree only
# on clean exit (round-3 lesson).
# Usage: scripts/regen_round4o.sh [artifact root]
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA dtype=bf16"; }

# never start while any benchmark python is still up (pgrep only — never
# kill by pattern)
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

run_sweep() { # run_sweep <module> <dest> <args...>
    local mod=$1 dest=$2; shift 2
    local tmp
    tmp=$(mktemp /tmp/bf16sweep.XXXXXX.log)
    log "bf16 $mod $* start -> $dest"
    stamp > "$tmp"
    if timeout 7200 python -m "tpu_bench.benchmarks.$mod" "$@" --dtype bf16 \
        >> "$tmp" 2>&1; then
        mv "$tmp" "$dest"
        log "bf16 $mod $* done"
    else
        log "bf16 $mod $* FAILED (exit $?) — left at $tmp, artifact untouched"
    fi
}

for i in 10 8 6 4 2; do
    run_sweep benchmark05 "$ROOT/bf16/b05/nq${i}x${i}x${i}.log" "$i" "$i" "$i"
done
log "regen_round4o complete"
