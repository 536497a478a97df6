#!/bin/bash
# Generate the committed artifact set (the reference's committed .log/.png
# analog) on the attached TPU.  Stage 1 is a representative core set; pass
# "full" for the reference's complete nq coverage.
set -u
ROOT=${1:-artifacts}
MODE=${2:-core}
HERE=$(dirname "$0")
PP="$HERE/../postprocess"

run() { echo ">>> $*" >&2; "$@"; }

for n in 01 02 03; do
    mkdir -p "$ROOT/b$n"
    run python -m "tpu_bench.benchmarks.benchmark$n" --step 8 \
        &> "$ROOT/b$n/outfile.log"
    run python "$PP/postprocess$n.py" "$ROOT/b$n"
done

mkdir -p "$ROOT/b04" "$ROOT/b05"
if [ "$MODE" = full ]; then NQ4="2 4 6 8 10 12 14 16 32"; NQ5="2 4 6 8 10";
else NQ4="4 8 16"; NQ5="8 10"; fi
for i in $NQ4; do
    run python -m tpu_bench.benchmarks.benchmark04 "$i" "$i" \
        --min-size 2048 --step 8 &> "$ROOT/b04/nq${i}x${i}.log"
done
run python "$PP/postprocess04.py" "$ROOT/b04"
for i in $NQ5; do
    run python -m tpu_bench.benchmarks.benchmark05 "$i" "$i" "$i" \
        --min-size 2048 --step 8 &> "$ROOT/b05/nq${i}x${i}x${i}.log"
done
run python "$PP/postprocess05.py" "$ROOT/b05"
