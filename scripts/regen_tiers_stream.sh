#!/bin/bash
# OPTIONAL tier addendum (run SOLO, only if wall clock allows after
# regen_round4f.sh): bf16 sweeps of the three streaming benchmarks.
# Scientifically minor — GB/s is traffic-normalized, so bf16 lands at the
# same bus ceilings — but it completes the reference's
# float-path-compiled-for-every-benchmark analog (benchmark01.cc:344,
# the float instantiation kept compiled next to double) and the tier
# table picks the logs up automatically (scripts/readme_table.tier_table).
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA dtype=bf16"; }

for n in 01 02 03; do
    mkdir -p "$ROOT/bf16/b$n"
    log "bf16 b$n start"
    { stamp; timeout 7200 python -m "tpu_bench.benchmarks.benchmark$n" \
        --dtype bf16 2>&1; } > "$ROOT/bf16/b$n/outfile.log"
done
log "regen_tiers_stream complete"
