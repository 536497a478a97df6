#!/bin/bash
# Single-stream artifact regeneration (VERDICT r2 weak #4/#6): every
# committed row measured under ONE condition — the chip otherwise idle —
# so peak rows and mid-curve rows share provenance, like the reference's
# one-clean-run-per-log semantics (benchmark04/run.sh:5-7).  Each log is
# stamped with a provenance header ("# provenance: ...", ignored by every
# parser: postprocess greps value lines, repair/honesty check token[2]).
#
# Compiles dominate wall-clock on the remote-compile link, so warm the
# persistent jax compile cache first with scripts/regen_warm.sh (parallel,
# results discarded); this pass then mostly just executes.
#
# Usage: scripts/regen_solo.sh [artifact root] [part]
#   part: all (default) | b04 | b05 | stream | f64 | ceilings
set -u
ROOT=${1:-artifacts}
PART=${2:-all}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

b04() { mkdir -p "$ROOT/b04"; log "b04 nq$1 start"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark04 "$1" "$1" 2>&1; } \
        > "$ROOT/b04/nq$1x$1.log"; log "b04 nq$1 done"; }
b05() { mkdir -p "$ROOT/b05"; log "b05 nq$1 start"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 "$1" "$1" "$1" 2>&1; } \
        > "$ROOT/b05/nq$1x$1x$1.log"; log "b05 nq$1 done"; }
stream() { mkdir -p "$ROOT/b$1"; log "b$1 start"
    { stamp; timeout 7200 python -m "tpu_bench.benchmarks.benchmark$1" 2>&1; } \
        > "$ROOT/b$1/outfile.log"; log "b$1 done"; }
bf16() { mkdir -p "$ROOT/bf16/b04" "$ROOT/bf16/b05"; log "bf16 start"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark04 8 8 --dtype bf16 2>&1; } \
        > "$ROOT/bf16/b04/nq8x8.log"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 8 8 8 --dtype bf16 2>&1; } \
        > "$ROOT/bf16/b05/nq8x8x8.log"; log "bf16 done"; }
f64() {
    mkdir -p "$ROOT/f64/b01" "$ROOT/f64/b02" "$ROOT/f64/b03" \
        "$ROOT/f64/b04" "$ROOT/f64/b05"
    for n in 01 02 03; do
        log "f64 b$n start"
        { stamp; timeout 7200 python -m "tpu_bench.benchmarks.benchmark$n" --dtype f64 2>&1; } \
            > "$ROOT/f64/b$n/outfile.log"
    done
    log "f64 b04 start"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark04 8 8 --dtype f64 --step 4 2>&1; } \
        > "$ROOT/f64/b04/nq8x8.log"
    log "f64 b05 start"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 8 8 8 --dtype f64 --step 4 2>&1; } \
        > "$ROOT/f64/b05/nq8x8x8.log"
    log "f64 done"
}
ceilings() { mkdir -p "$ROOT/ceilings"; log "ceilings start"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.ceilings 2>&1; } \
        > "$ROOT/ceilings/ceilings.log"; log "ceilings done"; }

case "$PART" in
  b04|all)      for i in 32 16 14 12 10 8 6 4 2; do b04 "$i"; done ;;&
  b05|all)      for i in 10 8 6 4 2; do b05 "$i"; done ;;&
  stream|all)   stream 01; stream 02; stream 03
                timeout 7200 python "$HERE/anchor.py" "$ROOT/anchor" ;;&
  bf16|all)     bf16 ;;&
  f64|all)      f64 ;;&
  ceilings|all) ceilings ;;&
  *) : ;;
esac
log "regen_solo $PART complete"
