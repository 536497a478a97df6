#!/bin/bash
# Round-4 stage U: after stage T drains, measure the bf16 3D plane-
# occupancy tax (exp_flat3dbf16.py) — plane vs flat fused-QP blocks at
# bf16 nq=8^3/10^3, one session, solo.  Commits the experiment log; any
# bf16 gate extension is a follow-up decision made on these numbers.
# Usage: scripts/regen_round4u.sh [pid-to-wait-for]
set -u
WAIT_PID=${1:-}
HERE=$(dirname "$0")
cd "$HERE/.."
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

if [ -n "$WAIT_PID" ]; then
    while [ -d "/proc/$WAIT_PID" ]; do sleep 15; done
fi
until timeout 90 python -c "import jax; jax.numpy.zeros(8).block_until_ready()" >/dev/null 2>&1; do
    log "TPU still down; retrying in 60s"
    sleep 60
done

SHA=$(git rev-parse --short HEAD)
mkdir -p artifacts/wall
L=artifacts/wall/flat3dbf16.log
log "exp_flat3dbf16 start"
if { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA (experiment)";
     timeout 1800 python docs/experiments/exp_flat3dbf16.py 2>&1; } > "$L.new"; then
    mv "$L.new" "$L"
    git add "$L"
    git commit -q -m "bf16 3D plane-tax measured: qp_shared3d vs flat at nq=8^3/10^3

Same-session solo epb sweeps (exp_flat3dbf16.py); decides whether the
flat QP dispatch gate extends to the bf16 tier's 16-row tile map.

No-Verification-Needed: experiment artifact log only" \
        && log "flat3dbf16 committed"
else
    rm -f "$L.new"
    log "exp_flat3dbf16 FAILED"
fi
