#!/bin/bash
# Full-density artifact regeneration, wide: one worker per job list.
# Remote compiles dominate sweep wall-clock and the compile-helper farm
# parallelizes across processes (the device itself multiplexes), so 6
# concurrent streams cut the 2-stream plan's ~14 h to a few hours.  Each
# sweep point is failure-isolated (cli.guarded), so a transient device OOM
# under concurrency costs one row, not a log.
#
# Usage: scripts/regen_parallel.sh W1|W2|W3|W4|W5|W6 [artifact root]
set -u
WORKER=${1:?worker W1..W6}
ROOT=${2:-artifacts}
HERE=$(dirname "$0")
PP="$HERE/../postprocess"

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

b04() { mkdir -p "$ROOT/b04"; log "b04 nq$1 start"
    python -m tpu_bench.benchmarks.benchmark04 "$1" "$1" \
        &> "$ROOT/b04/nq$1x$1.log"; log "b04 nq$1 done"; }
b05() { mkdir -p "$ROOT/b05"; log "b05 nq$1 start"
    python -m tpu_bench.benchmarks.benchmark05 "$1" "$1" "$1" \
        &> "$ROOT/b05/nq$1x$1x$1.log"; log "b05 nq$1 done"; }
stream() { mkdir -p "$ROOT/b$1"; log "b$1 start"
    python -m "tpu_bench.benchmarks.benchmark$1" &> "$ROOT/b$1/outfile.log"
    log "b$1 done"; }
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

case "$WORKER" in
  W1) b04 32; b04 8; b04 2 ;;
  W2) b04 16; b04 10; b04 4 ;;
  W3) b04 14; b04 12; b04 6; python "$PP/postprocess04.py" "$ROOT/b04" ;;
  W4) b05 10; b05 6; b05 2; python "$PP/postprocess05.py" "$ROOT/b05" ;;
  W5) b05 8; b05 4; stream 03; python "$HERE/anchor.py" "$ROOT/anchor"
      python "$PP/postprocess03.py" "$ROOT/b03" ;;
  W6) stream 01; stream 02; f64
      python "$PP/postprocess01.py" "$ROOT/b01"
      python "$PP/postprocess02.py" "$ROOT/b02"
      for n in 01 02 03; do
          python "$PP/postprocess$n.py" "$ROOT/f64/b$n" || true
      done
      python "$PP/postprocess04.py" "$ROOT/f64/b04" || true
      python "$PP/postprocess05.py" "$ROOT/f64/b05" || true ;;
  *) echo "unknown worker $WORKER" >&2; exit 1 ;;
esac
log "worker $WORKER complete"
