#!/bin/bash
# Fallback for nlaic Kodak-24 rows that fail DETERMINISTICALLY (5/5
# fresh-process attempts crash the TPU worker ~3 min into the 1001-step
# scan; both orientations affected, so not a shape issue).  Re-attacks
# the remaining FAILED rows with a different program shape —
# `-phase_space on --split_eval` (remat'd phase loss + piecewise eval)
# — which compiles a different executable and may dodge the fault.
# Replaces rows + recomputes the AVG exactly like r5_k24_retry.sh.
#
# Usage: bash scripts/r5_nlaic_fallback.sh [WAIT_PID]
set -u
cd /root/repo

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

m=nlaic; q=3; ck=ckpts/demo/nlaic-q3-mse-synthetic.msgpack
log=logs/r5_k24_nlaic_rerun.log

fails=$(grep ': FAILED' "$log" | cut -d: -f1 || true)
echo "### nlaic fallback pass (phase_space on + split_eval)  $(date)"
echo "remaining FAILED: $fails"
for img in $fails; do
  echo "--- fallback $m $img  $(date)"
  row=$(timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_rd \
    -m "$m" -q "$q" -metric mse -ckpt "$ck" -steps 1001 \
    -phase_space on --split_eval \
    -s "/tmp/kodak24/$img" 2>logs/r5_nlaic_fb_last_err.log \
    | grep '^kodim' | head -1 || true)
  if [ -n "$row" ]; then
    python - "$log" "$img" "$row" <<'EOF'
import sys
log, img, row = sys.argv[1], sys.argv[2], sys.argv[3]
lines = [l for l in open(log) if l.strip() != f"{img}: FAILED"]
lines = [l for l in lines if not l.startswith("AVG:")]
lines.append(row + "\n")
open(log, "w").writelines(sorted(lines))
EOF
    echo "$img: RESCUED (fallback)"
  else
    echo "$img: still failing; last stderr tail:"
    tail -3 logs/r5_nlaic_fb_last_err.log
  fi
done

# recompute AVG over whatever parsed rows exist now
python - "$log" <<'EOF'
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

# invcompress kodim04 — its corpus failure looked stochastic (23/24
# passed); the cut-short retry leg never reached it.  Two plain attempts.
ilog=logs/r5_k24_invcompress_rescue.log
ick=/tmp/invcompress-q3-mse-synthetic.msgpack
if grep -q 'kodim04.png: FAILED' "$ilog"; then
  for attempt in 1 2; do
    echo "--- retry invcompress kodim04.png (attempt $attempt)  $(date)"
    row=$(timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_rd \
      -m invcompress -q 3 -metric mse -ckpt "$ick" -steps 1001 \
      -s /tmp/kodak24/kodim04.png 2>/dev/null | grep '^kodim' | head -1 || true)
    if [ -n "$row" ]; then
      python - "$ilog" kodim04.png "$row" <<'EOF'
import sys
log, img, row = sys.argv[1], sys.argv[2], sys.argv[3]
lines = [l for l in open(log) if l.strip() != f"{img}: FAILED"]
lines = [l for l in lines if not l.startswith("AVG:")]
lines.append(row + "\n")
open(log, "w").writelines(sorted(lines))
EOF
      python - "$ilog" <<'EOF'
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
      echo "kodim04.png: RESCUED (invcompress)"
      break
    fi
  done
fi

echo "nlaic fallback done at $(date)"
