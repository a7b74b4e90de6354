#!/bin/bash
# Compact round-4 pipeline status: current leg, active log tails, processes.
cd /root/repo
date
echo "--- master:"; grep "########\|===" logs_pipeline_r4.out 2>/dev/null | tail -3
latest=$(ls -t logs/*.log 2>/dev/null | head -1)
echo "--- latest leg log ($latest):"; tail -3 "$latest" 2>/dev/null
echo "--- TPU procs:"; ps aux | awk '/imagecompression_adversarial_tpu|bench.py|bigimage/ && /python/ && !/awk/ {printf "%s cpu=%s%% rss=%.1fGB %s %s %s %s\n", $2, $3, $6/1048576, $13, $14, $15, $16}'
