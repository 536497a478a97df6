#!/bin/bash
# Full-density artifact regeneration (VERDICT r1 #3): the reference's
# complete committed-log coverage — x2 sweeps from the reference bounds for
# every benchmark and quadrature order (benchmark04/run.sh:5-7 commits 14
# rows for 9 b04 + 5 b05 nq values), plus the f64 parity set and the
# timing-anchor log.  Designed to run as two concurrent streams (compiles
# dominate wall-clock on the remote-compile link; the device multiplexes).
#
# Usage: scripts/regen_artifacts.sh A|B [artifact root]
set -u
STREAM=${1:?stream A or B}
ROOT=${2:-artifacts}
HERE=$(dirname "$0")
PP="$HERE/../postprocess"

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

b04() { # nq
    mkdir -p "$ROOT/b04"
    log "b04 nq$1 start"
    python -m tpu_bench.benchmarks.benchmark04 "$1" "$1" \
        &> "$ROOT/b04/nq$1x$1.log"
    log "b04 nq$1 done"
}
b05() { # nq
    mkdir -p "$ROOT/b05"
    log "b05 nq$1 start"
    python -m tpu_bench.benchmarks.benchmark05 "$1" "$1" "$1" \
        &> "$ROOT/b05/nq$1x$1x$1.log"
    log "b05 nq$1 done"
}
stream() { # b0N
    mkdir -p "$ROOT/b$1"
    log "b$1 start"
    python -m "tpu_bench.benchmarks.benchmark$1" &> "$ROOT/b$1/outfile.log"
    log "b$1 done"
}
f64() {
    mkdir -p "$ROOT/f64/b01" "$ROOT/f64/b02" "$ROOT/f64/b03" \
        "$ROOT/f64/b04" "$ROOT/f64/b05"
    for n in 01 02 03; do
        log "f64 b$n start"
        python -m "tpu_bench.benchmarks.benchmark$n" --dtype f64 \
            &> "$ROOT/f64/b$n/outfile.log"
    done
    log "f64 b04 start"
    python -m tpu_bench.benchmarks.benchmark04 8 8 --dtype f64 --step 4 \
        &> "$ROOT/f64/b04/nq8x8.log"
    log "f64 b05 start"
    python -m tpu_bench.benchmarks.benchmark05 8 8 8 --dtype f64 --step 4 \
        &> "$ROOT/f64/b05/nq8x8x8.log"
    log "f64 done"
}

if [ "$STREAM" = A ]; then
    for i in 32 16 14 12 10 8 6 4 2; do b04 "$i"; done
    stream 03
    python "$HERE/anchor.py" "$ROOT/anchor"
    python "$PP/postprocess04.py" "$ROOT/b04"
    python "$PP/postprocess03.py" "$ROOT/b03"
else
    for i in 10 8 6 4 2; do b05 "$i"; done
    stream 01
    stream 02
    log "ceilings start"
    mkdir -p "$ROOT/ceilings"
    python -m tpu_bench.benchmarks.ceilings &> "$ROOT/ceilings/ceilings.log"
    f64
    python "$PP/postprocess05.py" "$ROOT/b05"
    python "$PP/postprocess01.py" "$ROOT/b01"
    python "$PP/postprocess02.py" "$ROOT/b02"
    for n in 01 02 03; do
        python "$PP/postprocess$n.py" "$ROOT/f64/b$n" || true
    done
    python "$PP/postprocess04.py" "$ROOT/f64/b04" || true
    python "$PP/postprocess05.py" "$ROOT/f64/b05" || true
fi
log "stream $STREAM complete"
