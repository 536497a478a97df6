#!/bin/bash
# Round-4 stage C (run SOLO, after stage B's fresh ceilings and any kernel
# changes the wall experiments motivated): the nine b04 sweeps, the b05
# nq=2^3 sweep (the losing cell, re-measured against the same-session
# ceilings), then the corner-order tier sweeps (regen_tiers.sh).  With
# stage A (b05 4-10, streams, anchor, f64) this makes EVERY committed log
# a product of this round's one continuous solo queue.
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

for i in 32 16 14 12 10 8 6 4 2; do
    log "b04 nq$i start"
    { stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark04 "$i" "$i" 2>&1; } \
        > "$ROOT/b04/nq${i}x${i}.log"
    log "b04 nq$i done"
done

# anchor re-run: stage A's attempt crashed on a missing editable install
# (scripts/anchor.py now inserts the repo root itself)
log "anchor start"
timeout 7200 python "$HERE/anchor.py" "$ROOT/anchor"
sed -i "1i # provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA" \
    "$ROOT/anchor/anchor.log"
log "anchor done"

log "b05 nq2 start"
{ stamp; timeout 7200 python -m tpu_bench.benchmarks.benchmark05 2 2 2 2>&1; } \
    > "$ROOT/b05/nq2x2x2.log"
log "b05 nq2 done"

bash "$HERE/regen_tiers.sh" "$ROOT"
log "regen_round4c complete"
