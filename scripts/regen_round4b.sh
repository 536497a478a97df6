#!/bin/bash
# Round-4 stage B (run SOLO, immediately after regen_round4.sh):
#   1. fresh ceilings — same solo session block as the round-4 sweeps, so
#      the empirical per-mix honesty caps and the sweeps share provenance
#      (VERDICT r3 weak #5: the previous ceilings artifact was 13h and
#      several code revisions away from the sweeps it capped)
#   2. the two wall experiments, captured as citable artifacts:
#      exp_nq2wall (expand8 probe + production nq=2^3 tier, one session)
#      exp_nq14    (store-alignment candidates on the chip at last)
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA$1"; }

mkdir -p "$ROOT/ceilings" "$ROOT/wall"

log "ceilings start"
{ stamp ""; timeout 7200 python -m tpu_bench.benchmarks.ceilings 2>&1; } \
    > "$ROOT/ceilings/ceilings.log"
log "ceilings done"

log "exp_nq2wall start"
{ stamp " same-session probe+kernel (VERDICT r3 #3)"
  timeout 3600 python "$HERE/../docs/experiments/exp_nq2wall.py" 1048576 2>&1
} > "$ROOT/wall/nq2wall.log"
log "exp_nq2wall done"

log "exp_nq14 start"
{ stamp " store-alignment candidates on-chip (VERDICT r3 #2)"
  timeout 3600 python "$HERE/../docs/experiments/exp_nq14.py" 262144 2>&1
} > "$ROOT/wall/nq14.log"
log "exp_nq14 done"

log "exp_lo3d start"
{ stamp " wide-4D kron in 3D candidates"
  timeout 3600 python "$HERE/../docs/experiments/exp_lo3d.py" 1048576 2>&1
} > "$ROOT/wall/lo3d.log"
log "regen_round4b complete"
