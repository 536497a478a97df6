#!/bin/bash
# Corner-order tier sweeps (VERDICT r3 next #4/#5), run SOLO after the
# main regen:
#   bf16  — b04 nq=2/4/32 and b05 nq=2^3/10^3: the orders where halved
#           traffic changes which tier wins (the nq=2^3 losing cell's
#           1R:8W ceiling doubles under bf16; the reference compiles its
#           float path for every benchmark, benchmark04.cc:1072)
#   high  — b04 nq=32: the committed precision/throughput frontier (bf16x3
#           3-pass f32, rel-err ~1e-6 documented in kernels/bwdtrans2d._dot)
#           as a citable artifact log, ceiling-enforced like every tier
# Usage: scripts/regen_tiers.sh [artifact root]
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA$1"; }

mkdir -p "$ROOT/bf16/b04" "$ROOT/bf16/b05" "$ROOT/high/b04"

# high tier first (VERDICT r3 next #4 outranks the bf16 corners, #5): if
# wall clock truncates this queue, the lower-priority sweeps are the ones
# that drop
log "high b04 nq32 start"
{ stamp " precision=high (bf16x3 3-pass f32)"; timeout 7200 python -m \
    tpu_bench.benchmarks.benchmark04 32 32 --precision high 2>&1; } \
    > "$ROOT/high/b04/nq32x32.log"

for i in 2 4 32; do
    log "bf16 b04 nq$i start"
    { stamp " dtype=bf16"; timeout 7200 python -m tpu_bench.benchmarks.benchmark04 \
        "$i" "$i" --dtype bf16 2>&1; } > "$ROOT/bf16/b04/nq${i}x${i}.log"
done
for i in 2 10; do
    log "bf16 b05 nq$i start"
    { stamp " dtype=bf16"; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 \
        "$i" "$i" "$i" --dtype bf16 2>&1; } > "$ROOT/bf16/b05/nq${i}x${i}x${i}.log"
done
log "regen_tiers complete"
