#!/bin/bash
# Re-land the two Kodak-24 rows lost to the 2026-08-19 03:30 VM reboot
# (gitignored logs/ + /tmp wiped; only committed artifacts survived):
#   - invcompress q3: ckpt lived at /tmp (415 MB, deliberately uncommitted)
#     -> retrain 2000 steps, re-run the FULL 24-image corpus per-image.
#   - nlaic q3: ckpt survived (ckpts/demo) but the per-row log is gone and
#     10/24 rows crashed the TPU worker deterministically under the standard
#     attack program -> re-run the FULL 24 rows, first attempt with the
#     fallback program shape (-phase_space on --split_eval: different
#     executable, dodges the worker fault), falling back to the standard
#     shape on failure.
# Sequential, ONE TPU process at a time (CLAUDE.md rule).  Chain further
# legs by appending here, never by setsid-nohup pid chaining.
set -u
cd /root/repo
mkdir -p logs

echo "### [0] regenerate synthetic Kodak-24 corpus  $(date)"
python scripts/make_kodak24.py /tmp/kodak24
ls /tmp/kodak24 | wc -l

PY="python -m imagecompression_adversarial_tpu.cli"
ICK=/tmp/invcompress-q3-mse-synthetic.msgpack

echo "### [1] retrain invcompress q3 (2000 steps, synthetic)  $(date)"
timeout 14400 $PY.train -m invcompress -q 3 -metric mse -max_steps 2000 \
  2>&1 | tee logs/r5_retrain_invcompress.log | tail -4
timeout 1800 python scripts/export_ckpt.py ckpts/anchor/invcompress-0.0067-mse \
  -m invcompress -q 3 -o $ICK 2>&1 | tail -2
ls -la $ICK || { echo "EXPORT FAILED — aborting"; exit 1; }

# attempt_row <log> <img> <extra attack args...>
# one fresh process; appends the parsed row or returns nonzero
attempt_row() {
  local log=$1 img=$2; shift 2
  local row
  row=$(timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_rd \
    "$@" -steps 1001 -s "/tmp/kodak24/$img" 2>logs/r5_reland_last_err.log \
    | grep '^kodim' | head -1 || true)
  [ -n "$row" ] && { echo "$row" >> "$log"; return 0; }
  return 1
}

avg_log() {
  python - "$1" <<'EOF'
import re, sys
rows = []
for line in open(sys.argv[1]):
    m = re.match(r"kodim\d+\.png:((?: \w+ [+-]?[\d.]+s?)+)$", line.strip())
    if m:
        toks = m.group(1).split()
        rows.append({toks[i]: float(toks[i+1].rstrip("s"))
                     for i in range(0, len(toks), 2)})
if rows:
    keys = list(rows[0])
    avg = {k: sum(r[k] for r in rows) / len(rows) for k in keys}
    line = "AVG: " + " ".join(
        (f"{k} {avg[k]:+.4f}" if k == "dbpp" else f"{k} {avg[k]:.4f}")
        for k in keys) + f"  (n={len(rows)})"
    with open(sys.argv[1], "a") as f:
        f.write(line + "\n")
    print(line)
EOF
}

echo "### [2] invcompress Kodak-24, per-image fresh process  $(date)"
ILOG=logs/r5_k24_invcompress_v2.log; : > $ILOG
for f in /tmp/kodak24/kodim*.png; do
  img=$(basename $f)
  ok=0
  for attempt in 1 2 3; do
    echo "--- invcompress $img (attempt $attempt)  $(date)"
    if attempt_row $ILOG $img -m invcompress -q 3 -metric mse -ckpt $ICK; then
      ok=1; break
    fi
    tail -2 logs/r5_reland_last_err.log
  done
  [ $ok = 0 ] && echo "$img: FAILED" >> $ILOG
done
avg_log $ILOG

echo "### [3] nlaic Kodak-24, fallback-first per-image  $(date)"
NLOG=logs/r5_k24_nlaic_v2.log; : > $NLOG
NCK=ckpts/demo/nlaic-q3-mse-synthetic.msgpack
for f in /tmp/kodak24/kodim*.png; do
  img=$(basename $f)
  ok=0
  echo "--- nlaic $img (phase-space shape)  $(date)"
  if attempt_row $NLOG $img -m nlaic -q 3 -metric mse -ckpt $NCK \
       -phase_space on --split_eval; then
    ok=1
  else
    tail -2 logs/r5_reland_last_err.log
    echo "--- nlaic $img (standard shape)  $(date)"
    if attempt_row $NLOG $img -m nlaic -q 3 -metric mse -ckpt $NCK; then
      ok=1; echo "$img: used standard shape" >> logs/r5_k24_nlaic_v2_shapes.log
    else
      tail -2 logs/r5_reland_last_err.log
      echo "--- nlaic $img (phase-space shape, retry)  $(date)"
      attempt_row $NLOG $img -m nlaic -q 3 -metric mse -ckpt $NCK \
        -phase_space on --split_eval && ok=1
    fi
  fi
  [ $ok = 0 ] && echo "$img: FAILED" >> $NLOG
done
avg_log $NLOG

echo "### [4] bench confirmation on the rebooted VM (cold cache)  $(date)"
timeout 3600 python bench.py 2>&1 | tail -2
timeout 1800 python bench.py 2>&1 | tail -2

echo "reland done at $(date)"
