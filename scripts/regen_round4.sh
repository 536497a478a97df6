#!/bin/bash
# Round-4 landing of the round-3 solo regeneration (VERDICT r3 next #1).
# Remaining un-regenerated or damaged artifacts, ordered by value so an
# outage costs the least:
#   1. b05 nq8   — committed log truncated at nelmt=8192 (driver snapshot
#                  caught the regen mid-flight; peak rows destroyed)
#   2. b05 nq10  — committed log has 4 outage-dead XLA columns at 1048576
#   3. b05 nq6/4 — still round-2 mixed provenance
#   4. streams   — b01/b02/b03 + anchor, round-2 provenance
#   5. f64 tier  — round-2 provenance
# Same semantics as regen_solo.sh: ONE condition, chip otherwise idle,
# every log provenance-stamped.  Reference analog: one clean run per log
# (benchmark04/run.sh:5-7).
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

for i in 8 10 6 4; do
    log "b05 nq$i start"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 "$i" "$i" "$i" 2>&1; } \
        > "$ROOT/b05/nq${i}x${i}x${i}.log"
    log "b05 nq$i done"
done

for n in 01 02 03; do
    log "b$n start"
    { stamp; timeout 7200 python -m "tpu_bench.benchmarks.benchmark$n" 2>&1; } \
        > "$ROOT/b$n/outfile.log"
    log "b$n done"
done

log "anchor start"
timeout 7200 python "$HERE/anchor.py" "$ROOT/anchor"
sed -i "1i # provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA" \
    "$ROOT/anchor/anchor.log"
log "anchor done"

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
log "regen_round4 complete"
