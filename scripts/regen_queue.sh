#!/bin/bash
# Parameterized artifact-regen queue (replaces the round-4 pile of one-shot
# regen_round4*.sh scripts — VERDICT r4 next #8).  Takes a manifest of rows
#
#     <bench> <nq|-> <dtype> [extra CLI args...]
#
# e.g. "b05 10 f32", "b04 8 f64", "b01 - f64 --ntests 20"; '#' starts a
# comment.  For each row it runs the sweep solo (single stream, chip
# otherwise idle), outage-hardened: output goes to <log>.new and only
# replaces the committed log on clean exit, so a mid-run kill can never
# truncate a committed artifact.  After each landed log: the dead-column
# annotation pass (scripts/annotate_log.py), the matching postprocess
# plot, the README table regen, and the tooling suite gate — then an
# auto-land commit staging ONLY that log, its plots, and README.md
# (explicit pathspecs: a stale .new from an interrupted run can never be
# swept into a commit — ADVICE r4 #1).
#
# Usage: scripts/regen_queue.sh MANIFEST [note-for-commit-body]
# ROW_TIMEOUT (seconds, default 7200) bounds each row; raise it for
# rows whose XLA f64 columns alone exceed two hours (e.g. b05 nq=10^3).
set -u
HERE=$(dirname "$0")
cd "$HERE/.."
MANIFEST=${1:?usage: regen_queue.sh MANIFEST [note]}
NOTE=${2:-}

log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

# Solo-chip handshake: register this queue's process group so bench.py
# (the driver's headline measurement) can terminate it by EXACT pgid —
# never by pattern — before timing.  Killing mid-row is safe by design:
# an interrupted row leaves only a .new file that is never committed.
PGID_FILE=/tmp/tpu_bench_queue.pgid
ps -o pgid= -p $$ | tr -d ' ' > "$PGID_FILE"
trap 'rm -f "$PGID_FILE"' EXIT

log "waiting for the TPU relay"
until timeout 90 python -c "import jax; jax.numpy.zeros(8).block_until_ready()" >/dev/null 2>&1; do
    log "TPU still down; retrying in 60s"
    sleep 60
done
log "TPU up"

SHA=$(git rev-parse --short HEAD)
stamp() { echo "# provenance: solo single-stream regen $(date -u +%FT%TZ) @$SHA (regen_queue $MANIFEST)"; }

grep -v '^[[:space:]]*#' "$MANIFEST" | grep -v '^[[:space:]]*$' | \
while read -r BENCH NQ DTYPE EXTRA; do
    case "$DTYPE" in
        f32)  ROOT=artifacts; DFLAG="" ;;
        f64)  ROOT=artifacts/f64; DFLAG="--dtype f64" ;;
        bf16) ROOT=artifacts/bf16; DFLAG="--dtype bf16" ;;
        *) log "unknown dtype '$DTYPE' — row skipped"; continue ;;
    esac
    NN=${BENCH#b}
    [ "$NQ" = "-" ] && NQ=""
    case "$BENCH" in
        b01|b02|b03) DIR="$ROOT/$BENCH"; L="$DIR/outfile.log"
                     ARGS="" ;;
        b04) DIR="$ROOT/b04"; L="$DIR/nq${NQ}x${NQ}.log"
             ARGS="$NQ $NQ" ;;
        b05) DIR="$ROOT/b05"; L="$DIR/nq${NQ}x${NQ}x${NQ}.log"
             ARGS="$NQ $NQ $NQ" ;;
        *) log "unknown benchmark '$BENCH' — row skipped"; continue ;;
    esac
    mkdir -p "$DIR"
    rm -f "$L.new"
    log "$BENCH nq=$NQ $DTYPE start"
    # shellcheck disable=SC2086  # ARGS/DFLAG/EXTRA are word lists
    # --foreground keeps the row in THIS script's process group, so the
    # solo-chip handshake (one killpg from bench.py) stops the queue AND
    # the in-flight row; GNU timeout's default new-group behavior would
    # orphan the row past any group kill.
    if { stamp; timeout --foreground "${ROW_TIMEOUT:-7200}" python -m "tpu_bench.benchmarks.benchmark$NN" \
            $ARGS $DFLAG $EXTRA 2>&1; } > "$L.new"; then
        mv "$L.new" "$L"
        log "$BENCH nq=$NQ $DTYPE landed"
    else
        rm -f "$L.new"
        log "$BENCH nq=$NQ $DTYPE FAILED — committed log kept"
        continue
    fi
    python scripts/annotate_log.py "$L" >/dev/null
    python "postprocess/postprocess$NN.py" "$DIR" >/dev/null
    python scripts/readme_table.py >/dev/null
    if python -m pytest tests/test_tooling.py -q >/dev/null 2>&1; then
        git add "$L" "$DIR"/*.png README.md 2>/dev/null \
            || git add "$L" README.md
        git commit -q -m "$DTYPE $BENCH${NQ:+ nq=$NQ} sweep re-run (auto-landed via regen_queue)

Solo single-stream regen; dead columns annotated in-log, plot + README
table regenerated in the same commit, tooling suite green.${NOTE:+
$NOTE}

No-Verification-Needed: artifact log + generated plot/README table only" \
            && log "$BENCH nq=$NQ $DTYPE committed"
    else
        log "$BENCH nq=$NQ $DTYPE: tooling suite RED — left uncommitted"
    fi
done
log "queue done"
