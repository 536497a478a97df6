#!/bin/bash
# Compile-cache warm pass for regen_solo.sh: run the full sweep grid with
# minimal repetitions, output DISCARDED, several workers in parallel.
# Every (variant, size) executable lands in the persistent jax compile
# cache (~/.cache/tpu_bench_jax), so the subsequent solo single-condition
# regeneration mostly just executes.  Timing contention here is
# irrelevant — nothing measured in this pass is kept.
#
# Usage: scripts/regen_warm.sh W1|W2|W3|W4|W5|W6
set -u
WORKER=${1:?worker W1..W6}
SCRATCH=$(mktemp -d)
trap 'rm -rf "$SCRATCH"' EXIT

log() { echo "[$(date +%H:%M:%S)] warm $*" >&2; }

b04() { log "b04 nq$1"; python -m tpu_bench.benchmarks.benchmark04 \
    "$1" "$1" --ntests 4 &> "$SCRATCH/b04_$1.log"; }
b05() { log "b05 nq$1"; python -m tpu_bench.benchmarks.benchmark05 \
    "$1" "$1" "$1" --ntests 4 &> "$SCRATCH/b05_$1.log"; }
stream() { log "b$1"; python -m "tpu_bench.benchmarks.benchmark$1" \
    --ntests 4 &> "$SCRATCH/b$1.log"; }

case "$WORKER" in
  W1) b04 32; b04 8; b04 2 ;;
  W2) b04 16; b04 10; b04 4 ;;
  W3) b04 14; b04 12; b04 6 ;;
  W4) b05 10; b05 6; b05 2 ;;
  W5) b05 8; b05 4; stream 03 ;;
  W6) stream 01; stream 02
      python -m tpu_bench.benchmarks.benchmark04 8 8 --dtype bf16 \
          --ntests 4 &> "$SCRATCH/bf16_04.log"
      python -m tpu_bench.benchmarks.benchmark05 8 8 8 --dtype bf16 \
          --ntests 4 &> "$SCRATCH/bf16_05.log"
      python -m tpu_bench.benchmarks.benchmark04 8 8 --dtype f64 --step 4 \
          --ntests 4 &> "$SCRATCH/f64_04.log"
      python -m tpu_bench.benchmarks.benchmark05 8 8 8 --dtype f64 --step 4 \
          --ntests 4 &> "$SCRATCH/f64_05.log" ;;
  *) echo "unknown worker $WORKER" >&2; exit 1 ;;
esac
log "$WORKER done"
