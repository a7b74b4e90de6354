#!/bin/bash
# Post-queue follow-ups (chained after scripts/r5_pipeline.sh):
#   A. two-phase cond/select A/B + remat A/B + the two fwd floors
#   B. bench with the compile cache OFF (fresh compile) — isolates the
#      cache variable in the 210-vs-560 adjudication
#   C. bench normal (phase-aware sanity floor)
#   D. fic attack re-run with HOST-looped restarts (the vmapped program
#      crashes the TPU worker)
set -u
cd /root/repo
R5_PID="${1:?r5 pipeline pid}"
while kill -0 "$R5_PID" 2>/dev/null; do sleep 60; done
echo "r5 queue done; follow-ups at $(date)"

timeout 5400 python scripts/perf_two_phase.py 2>&1 | tee logs/r5_two_phase_ab.log | tail -10

ICAT_COMPILE_CACHE=none timeout 3600 python bench.py 2>&1 | tee logs/r5_bench_nocache.log | tail -2
timeout 3600 python bench.py 2>&1 | tee logs/r5_bench_c.log | tail -2

timeout 9000 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m fic -q 3 -metric mse -ckpt ckpts/demo/fic-q3-mse-synthetic.msgpack \
  -random 2 -restart_impl host -steps 1001 -s '/tmp/kodak_synth/kodim0[12].png' \
  2>&1 | tee logs/r5_attack_fic_host.log | tail -4
echo "follow-ups done at $(date)"
