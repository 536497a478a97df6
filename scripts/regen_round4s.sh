#!/bin/bash
# Round-4 stage P (failsafe): after stage O drains, regenerate the README
# table and commit any landed sweep logs (generalized stage-N pattern:
# survives an API-gateway outage at snapshot time).  No-op when the
# interactive session already committed.
# Usage: scripts/regen_round4s.sh [pid-to-wait-for]
set -u
WAIT_PID=${1:-}
HERE=$(dirname "$0")
cd "$HERE/.."

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

if [ -n "$WAIT_PID" ]; then
    while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
fi
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

if git diff --quiet -- artifacts && [ -z "$(git status --porcelain artifacts)" ]; then
    log "artifact tree clean — nothing to do"
    exit 0
fi

python scripts/readme_table.py >/dev/null
git add artifacts README.md
if git diff --cached --quiet; then
    log "nothing staged — done"
    exit 0
fi
git commit -m "f32 b04 sweeps re-run under the qp_w_flat dispatch (auto-landed)

Stage-O regen results committed by the stage-P failsafe with the README
table regenerated in the same commit.

No-Verification-Needed: artifact logs + generated README table only"
log "failsafe commit created"
