#!/bin/bash
# Resume of the round-3 solo single-stream regeneration after the TPU
# backend outage of 2026-08-17T20:18Z (the bf16 pass crashed mid-run and
# b05 nq4-10 / streams / f64 never ran).  Same semantics as
# regen_solo.sh: one condition, chip idle, provenance-stamped logs.
# Ordered by value so a second outage costs the least: bf16 (committed
# logs are the pre-fix broken ones) > b05 staleness > streams > f64.
set -u
ROOT=${1:-artifacts}
HERE=$(dirname "$0")

bash "$HERE/regen_solo.sh" "$ROOT" bf16
for i in 10 8 6 4; do
    SHA=$(git -C "$HERE/.." rev-parse --short HEAD 2>/dev/null || echo unknown)
    echo "[$(date +%H:%M:%S)] b05 nq$i start" >&2
    { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA"
      timeout 7200 python -m tpu_bench.benchmarks.benchmark05 "$i" "$i" "$i" 2>&1
    } > "$ROOT/b05/nq${i}x${i}x${i}.log"
    echo "[$(date +%H:%M:%S)] b05 nq$i done" >&2
done
bash "$HERE/regen_solo.sh" "$ROOT" stream
bash "$HERE/regen_solo.sh" "$ROOT" f64
echo "[$(date +%H:%M:%S)] regen_resume complete" >&2
