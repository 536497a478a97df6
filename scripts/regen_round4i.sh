#!/bin/bash
# Round-4 stage G: complete the bf16 tier across ALL sweep orders.
# The reference compiles its float path for every benchmark and every nq
# (benchmark04/benchmark04.cc:1072); after the corner sweeps landed
# (regen_tiers.sh + the nq=10^3 / stream follow-ups) the remaining depth
# gap is the mid orders:
#   bf16 b04 nq = 6, 10, 12, 14, 16
#   bf16 b05 nq = 4^3, 6^3
# Each sweep is written to a temp file and moved into the artifact tree
# only when its python exits 0 — an interrupted run never leaves a
# truncated log dirty over a committed artifact (round-3 lesson).
# Usage: scripts/regen_round4i.sh [artifact root]
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

for i in 6 10 12 14 16; do
    run_sweep benchmark04 "$ROOT/bf16/b04/nq${i}x${i}.log" "$i" "$i"
done
for i in 4 6; do
    run_sweep benchmark05 "$ROOT/bf16/b05/nq${i}x${i}x${i}.log" "$i" "$i" "$i"
done
log "regen_round4i complete"
