#!/bin/bash
# Round-4 stage N (failsafe): after the stage-M/M2 bf16 re-runs drain,
# regenerate the README table and commit any landed sweep logs so the
# tree is never left with artifacts whose peaks the README does not
# reflect (the exact state that fails
# tests/test_tooling.py::test_readme_table_in_sync_with_artifacts).
# Exists because the API gateway can die for hours mid-round (round4.md
# §6b, memory): if the interactive session is alive it will have
# committed already and this stage is a no-op.
# Usage: scripts/regen_round4q.sh [pid-to-wait-for]
set -u
WAIT_PID=${1:-}
HERE=$(dirname "$0")
cd "$HERE/.."

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

if [ -n "$WAIT_PID" ]; then
    log "waiting for PID $WAIT_PID (stage-M2)"
    while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
fi
while pgrep -f "tpu_bench.benchmarks" > /dev/null 2>&1; do sleep 10; done

if git diff --quiet -- artifacts && [ -z "$(git status --porcelain artifacts)" ]; then
    log "artifact tree clean — nothing to do"
    exit 0
fi

python scripts/readme_table.py >/dev/null
git add artifacts/bf16 README.md
if git diff --cached --quiet; then
    log "nothing staged — done"
    exit 0
fi
git commit -m "bf16 b05 sweeps re-run under the f32v combine (auto-landed)

Stage M/M2 regen results committed by the stage-N failsafe with the
README table regenerated in the same commit, keeping the sync test
green if the interactive session is down at snapshot time.

No-Verification-Needed: artifact logs + generated README table only"
log "failsafe commit created"
