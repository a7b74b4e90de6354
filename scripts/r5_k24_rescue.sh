#!/bin/bash
# Per-image fresh-process Kodak-24 runs for the two families whose 24-image
# single-process legs died to TPU worker crashes (nlaic @kodim03,
# invcompress @kodim04 — logs/r5_k24_{nlaic,invcompress}.log).  Process
# isolation is the mitigation that already rescued the round-5 fic leg;
# the persistent compile cache keeps the per-image restart cost to the
# import + load time.  An AVG line is computed across the per-image rows so
# scripts/collect_k24.py reads these logs like any other leg.
#
# Usage: bash scripts/r5_k24_rescue.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

run_family() {  # run_family <model> <q> <ckpt> <logname>
  local m=$1 q=$2 ck=$3 log=logs/$4
  : > "$log"
  for f in /tmp/kodak24/kodim*.png; do
    echo "--- $m $(basename $f)  $(date)"
    timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_rd \
      -m "$m" -q "$q" -metric mse -ckpt "$ck" -steps 1001 -s "$f" 2>&1 \
      | grep '^kodim' >> "$log" || echo "$(basename $f): FAILED" >> "$log"
  done
  python - "$log" <<'EOF'
import re, sys
rows = []
for line in open(sys.argv[1]):
    m = re.match(r"kodim\d+\.png:((?: \w+ [+-]?[\d.]+s?)+)$", line.strip())
    if m:
        toks = m.group(1).split()
        rows.append({toks[i]: float(toks[i+1].rstrip("s"))
                     for i in range(0, len(toks), 2)})
n = len(rows)
if rows:
    keys = list(rows[0])
    avg = {k: sum(r[k] for r in rows) / n for k in keys}
    line = "AVG: " + " ".join(
        (f"{k} {avg[k]:+.4f}" if k == "dbpp" else f"{k} {avg[k]:.4f}")
        for k in keys) + f"  (n={n})"
    with open(sys.argv[1], "a") as f:
        f.write(line + "\n")
    print(line)
EOF
}

echo "### nlaic per-image rescue  $(date)"
run_family nlaic 3 ckpts/demo/nlaic-q3-mse-synthetic.msgpack r5_k24_nlaic_rerun.log

echo "### invcompress per-image rescue  $(date)"
run_family invcompress 3 /tmp/invcompress-q3-mse-synthetic.msgpack r5_k24_invcompress_rescue.log

echo "rescue done at $(date)"
