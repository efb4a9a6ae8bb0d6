#!/bin/bash
# Run a long-lived background job in its own session (setsid) and register
# its pgid in runs/bench_pause/<name>.pid so bench.py can SIGSTOP the whole
# tree during latency measurement windows (bench.py pause_background_jobs).
# ADVICE r4: the pause mechanism previously had no producers — every
# long-running launcher must go through this wrapper (or replicate it).
#
# Usage: tools/bgjob.sh NAME CMD [ARGS...]
#   e.g. nohup tools/bgjob.sh parity_r4 bash tools/run_parity_r4.sh \
#          > runs/parity_r4.log 2>&1 &
set -u
NAME="$1"; shift
DIR="$(cd "$(dirname "$0")/.." && pwd)/runs/bench_pause"
mkdir -p "$DIR"
PIDFILE="$DIR/$NAME.pid"
cleanup() { rm -f "$PIDFILE"; }
trap cleanup EXIT INT TERM
setsid "$@" &
PID=$!
echo "$PID" > "$PIDFILE"
wait "$PID"
exit $?
