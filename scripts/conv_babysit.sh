#!/bin/bash
# Chunked, OOM-guarded driver for the cross-session convergence run
# (tools/learning_demo.py --ckpt-dir runs/conv).
#
# Why: on 2026-08-20 a single resumed session was OOM-killed at 126 GB
# anon RSS (dmesg oom-kill of the demo python) during a degraded axon
# tunnel window — host memory grows ~GB/min while the run crawls, which
# points at client-side transfer buffering, not the model (params+opt
# state are ~1.5 GB). SIGKILL loses progress since the last --save-every
# checkpoint; SIGTERM triggers the demo's save-and-exit handler.
#
# So: run the demo in sessions that each end at the next eval point
# (eval runs before the session exits -> no eval is lost to chunking),
# and watch RSS — past the threshold, SIGTERM so the session saves and
# the next chunk resumes from its checkpoint with a fresh process.
#
# Usage: bash scripts/conv_babysit.sh [TARGET_ITERS=500] [RSS_GB=85]
#        [EVAL_EVERY=50]
# EVAL_EVERY=50 in degraded tunnel windows: each chunk ends with an
# n=48 eval, so partial progress still yields recorded curve points.

set -u
cd "$(dirname "$0")/.."
TARGET=${1:-500}
RSS_LIMIT_KB=$(( ${2:-85} * 1024 * 1024 ))
EVAL_EVERY=${3:-50}
LOG=runs/conv_r5.log

last_iter() {
    ls runs/conv 2>/dev/null | grep -oP 'ckpt_iter\K\d+' | sort -n | tail -1
}

while true; do
    last=$(last_iter); last=${last:-0}
    if [ "$last" -ge "$TARGET" ]; then
        echo "{\"babysit\": \"done\", \"iter\": $last}" >> "$LOG"
        break
    fi
    # session target = next eval point, so the eval at that point runs
    # (and prints) before the session exits
    next=$(( (last / EVAL_EVERY + 1) * EVAL_EVERY ))
    [ "$next" -gt "$TARGET" ] && next=$TARGET
    echo "{\"babysit\": \"session\", \"from\": $last, \"to\": $next}" >> "$LOG"
    PYTHONPATH=/root/.axon_site:/root/repo timeout 10800 stdbuf -oL \
        python -u tools/learning_demo.py --iters "$next" \
        --eval-every $EVAL_EVERY --eval-episodes 48 \
        --ckpt-dir runs/conv --save-every 25 --depth-u16 \
        >> "$LOG" 2>&1 &
    pid=$!
    # RSS watchdog: SIGTERM (-> demo saves) before the OOM killer fires.
    # NB: $pid is the `timeout` wrapper (VmRSS ~1 MB) — the leak lives in
    # its python CHILD, so resolve and watch that (first launch of this
    # script watched the wrapper and never fired; the OOM killer won).
    while kill -0 "$pid" 2>/dev/null; do
        py=$(ps -o pid= --ppid "$(ps -o pid= --ppid "$pid" | head -1 \
             | tr -d ' ')" 2>/dev/null | head -1 | tr -d ' ')
        [ -z "$py" ] && py=$(ps -o pid= --ppid "$pid" | head -1 \
                             | tr -d ' ')
        rss=$(awk '/VmRSS/{print $2}' "/proc/${py:-0}/status" 2>/dev/null \
              || echo 0)
        if [ "${rss:-0}" -gt "$RSS_LIMIT_KB" ]; then
            echo "{\"babysit\": \"rss_limit\", \"rss_kb\": $rss}" >> "$LOG"
            kill -TERM "${py:-$pid}"
            # give the save up to 10 min, then escalate (python AND the
            # timeout wrapper, so neither is orphaned)
            for _ in $(seq 1 60); do
                kill -0 "${py:-$pid}" 2>/dev/null || break
                sleep 10
            done
            kill -KILL "${py:-$pid}" "$pid" 2>/dev/null
            break
        fi
        sleep 30
    done
    wait "$pid" 2>/dev/null
    new_last=$(last_iter); new_last=${new_last:-0}
    if [ "$new_last" -le "$last" ]; then
        echo "{\"babysit\": \"no_progress\", \"iter\": $new_last}" >> "$LOG"
        break   # don't loop forever on a wedged tunnel
    fi
done
