#!/bin/bash
# Serial TPU job queue (r5 consolidation of the one-shot r4_tpu_queue*
# scripts — VERDICT r4 Weak #6).
#
# Usage:  nohup setsid bash scripts/tpu_queue.sh [QUEUE_FILE] \
#             > /tmp/r5_queue.log 2>&1 &
#
# QUEUE_FILE (default bench_artifacts/r5/queue.txt) holds one job per
# line:    <tag>|<timeout_seconds>|<command ...>
# Lines starting with '#' are comments. Jobs run strictly one at a time
# (the chip is single-tenant behind the tunnel). A finished job leaves
# bench_artifacts/r5/<tag>.done (exit code inside) and its stdout+stderr
# in bench_artifacts/r5/<tag>.log; tagged jobs already .done are
# skipped, so the queue is resumable and the file can be APPENDED TO
# WHILE RUNNING — the runner rescans after every job and idles in
# 60-second naps when nothing is pending. A line reading 'STOP' ends
# the runner once everything above it is done.
set -u
cd "$(dirname "$0")/.."
QUEUE="${1:-bench_artifacts/r5/queue.txt}"
ART="bench_artifacts/r5"
mkdir -p "$ART"

stamp() { echo "=== [$(date -u +%H:%M:%S)] $*" ; }

while true; do
    ran_one=0
    stop_seen=0
    while IFS='|' read -r tag tmo cmd; do
        case "$tag" in ''|'#'*) continue ;; esac
        if [ "$tag" = "STOP" ]; then stop_seen=1; break; fi
        [ -f "$ART/$tag.done" ] && continue
        stamp "job $tag (timeout ${tmo}s): $cmd"
        timeout "$tmo" bash -c "$cmd" > "$ART/$tag.log" 2>&1
        rc=$?
        echo "$rc" > "$ART/$tag.done"
        stamp "job $tag exit=$rc"
        tail -n 3 "$ART/$tag.log"
        ran_one=1
        break   # rescan from the top (the file may have changed)
    done < "$QUEUE"
    if [ "$ran_one" = 0 ]; then
        if [ "$stop_seen" = 1 ]; then stamp "queue drained, STOP"; break; fi
        sleep 60
    fi
done
