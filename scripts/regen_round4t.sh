#!/bin/bash
# Round-4 stage T: wait out the TPU-relay outage, then re-run the b05 f32
# sweeps whose QP/Shared column changed under the qp_shared3d_flat
# dispatch (@8df2bfc), in priority order (8^3 headline, 10^3, 6^3).
#
# Outage-hardened (round-3 lesson): each sweep writes to <log>.new and
# only replaces the committed log on clean exit, so a mid-run kill can
# never truncate a committed artifact.  After each landed log the README
# table is regenerated, the tooling suite (readme sync + honesty bounds)
# must be green, and the result is committed — partial progress always
# lands in a consistent state.
# Usage: scripts/regen_round4t.sh
set -u
HERE=$(dirname "$0")
cd "$HERE/.."
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

log "waiting for the TPU relay"
until timeout 90 python -c "import jax; jax.numpy.zeros(8).block_until_ready()" >/dev/null 2>&1; do
    log "TPU still down; retrying in 60s"
    sleep 60
done
log "TPU back"

SHA=$(git rev-parse --short HEAD)
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"; }

for i in 8 10 6; do
    L="artifacts/b05/nq${i}x${i}x${i}.log"
    log "b05 nq$i start"
    if { stamp; timeout 3000 python -m tpu_bench.benchmarks.benchmark05 "$i" "$i" "$i" 2>&1; } > "$L.new"; then
        mv "$L.new" "$L"
        log "b05 nq$i landed"
    else
        rm -f "$L.new"
        log "b05 nq$i FAILED — committed log kept"
        continue
    fi
    python postprocess/postprocess05.py artifacts/b05 >/dev/null
    python scripts/readme_table.py >/dev/null
    if python -m pytest tests/test_tooling.py -q >/dev/null 2>&1; then
        git add artifacts/b05 README.md
        git commit -q -m "f32 b05 nq=${i}^3 re-run under the qp_shared3d_flat dispatch (auto-landed)

Solo single-stream regen after the TPU-relay outage cleared; README
table regenerated in the same commit, tooling suite green.

No-Verification-Needed: artifact log + generated README table only" \
            && log "b05 nq$i committed"
    else
        log "b05 nq$i: tooling suite RED — left uncommitted for review"
    fi
done
log "stage T done"
