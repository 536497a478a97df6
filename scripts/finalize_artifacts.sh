#!/bin/bash
# Post-regeneration finalization (run SOLO, chip idle):
#   1. ceiling repair  — re-run rows the 6-way-contended regen over-estimated
#   2. peaks refresh   — re-run each log's headline rows solo (contention
#                        depresses min-of-reps; peaks must be uncontended)
#   3. second ceiling pass over the refreshed rows (solo reruns are bound
#      by the same physics; a violation here means a real methodology bug)
#   4. regenerate every .png and the README performance table
#   5. run the CPU test suite and REFUSE to succeed while it is red or the
#      README table is stale — the round-3 failure mode (artifacts landed
#      but the sync test red at HEAD) exits nonzero here (VERDICT r3 #8)
#
# Usage: scripts/finalize_artifacts.sh [artifact root]
set -eu
ROOT=${1:-artifacts}
HERE=$(dirname "$0")
PP="$HERE/../postprocess"

python "$HERE/repair_rows.py" "$ROOT"
python "$HERE/repair_rows.py" "$ROOT" --peaks
python "$HERE/repair_rows.py" "$ROOT"

for n in 01 02 03; do
    python "$PP/postprocess$n.py" "$ROOT/b$n"
    python "$PP/postprocess$n.py" "$ROOT/f64/b$n" || true
    python "$PP/postprocess$n.py" "$ROOT/bf16/b$n" || true
done
python "$PP/postprocess04.py" "$ROOT/b04"
python "$PP/postprocess05.py" "$ROOT/b05"
python "$PP/postprocess04.py" "$ROOT/f64/b04" || true
python "$PP/postprocess05.py" "$ROOT/f64/b05" || true
python "$PP/postprocess04.py" "$ROOT/bf16/b04" || true
python "$PP/postprocess05.py" "$ROOT/bf16/b05" || true
python "$PP/postprocess04.py" "$ROOT/high/b04" || true

python "$HERE/readme_table.py"
python "$HERE/readme_table.py" --check
python -m pytest "$HERE/../tests" -q
echo "finalize complete — suite green, README table in sync"
