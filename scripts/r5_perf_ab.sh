#!/bin/bash
# Waits for the r5 queue to exit, then runs the two-phase cond/select A/B
# on the idle chip.  ONE TPU process at a time.
set -u
cd /root/repo
R5_PID="${1:?r5 pipeline pid}"
while kill -0 "$R5_PID" 2>/dev/null; do sleep 60; done
echo "r5 queue done; two-phase A/B at $(date)"
timeout 5400 python scripts/perf_two_phase.py 2>&1 | tee logs/r5_two_phase_ab.log
echo "A/B done"
