#!/bin/bash
# Second-stage warm for configs whose Pallas(Coales) executables changed
# with the VMEM-bounded wide4 chunk (ops/bwdtrans.wide4_chunk_elems):
# nq=10/12 moved to ce=16384, nq=14/16 to 8192, nq=32 to 2048.  Same
# discard-output contract as regen_warm.sh.
#
# Usage: scripts/regen_warm2.sh V1|V2|V3
set -u
WORKER=${1:?worker V1..V3}
# Output kept (not scratch-deleted): the Coales column of these logs is
# the compile/norm evidence for the new chunk widths.
SCRATCH=${WARM2_OUT:-/tmp/warm2}
mkdir -p "$SCRATCH"

log() { echo "[$(date +%H:%M:%S)] warm2 $*" >&2; }

b04() { log "b04 nq$1"; python -m tpu_bench.benchmarks.benchmark04 \
    "$1" "$1" --ntests 4 &> "$SCRATCH/b04_$1.log"; }

case "$WORKER" in
  V1) b04 32 ;;
  V2) b04 16; b04 10 ;;
  V3) b04 14; b04 12 ;;
  *) echo "unknown worker $WORKER" >&2; exit 1 ;;
esac
log "$WORKER done"
