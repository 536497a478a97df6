#!/bin/bash
# Round-4 stage A remainder + stage B, re-queued after the container
# restart interrupted regen_round4.sh mid-f64 (only f64/b01 was stamped):
#   1. b02 stream re-run — the committed log carries a fabricated 98 PB/s
#      row at size 8192 (the pre-fix 1e-12 clamp in time_chained; see
#      core/timing._per_from_window)
#   2. f64 tier remainder: b02 b03 b04 b05
#   3. stage B: same-session ceilings + the wall experiments
# Same semantics as regen_solo.sh: ONE condition, chip otherwise idle,
# every log provenance-stamped.
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

log "b02 start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark02 2>&1; } \
    > "$ROOT/b02/outfile.log"
log "b02 done"

for n in 02 03; do
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

bash "$HERE/regen_round4b.sh" "$ROOT"
log "regen_round4d complete"
