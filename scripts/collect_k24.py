"""Collect the Kodak-24 pipeline AVG lines into markdown tables.

Reads the logs written by scripts/r5_kodak24{,b}.sh, r5_metric_axis.sh,
r5_quality_axis.sh and r5_analysis_sweep.sh and prints the RESULTS.md
tables, so transcription is mechanical.

Usage: python scripts/collect_k24.py
"""

import os
import re

LOGS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "logs")


def last_avg(name):
    path = os.path.join(LOGS, name)
    if not os.path.exists(path):
        return None
    avg = None
    with open(path) as f:
        for line in f:
            if line.startswith("AVG:"):
                avg = line.strip()
    return avg


def fields(avg):
    """AVG: k1 v1 k2 v2 ... -> dict"""
    toks = avg.split()[1:]
    out = {}
    k = None
    for t in toks:
        if re.fullmatch(r"[+-]?\d+(\.\d+)?s?", t):
            if k is not None:
                out[k] = t.rstrip("s")
                k = None
        else:
            k = t if k is None else f"{k} {t}"
    return out


def table(title, rows, cols):
    print(f"\n### {title}\n")
    print("| " + " | ".join(["run"] + cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    for label, log in rows:
        avg = last_avg(log)
        if avg is None:
            print(f"| {label} | " + " | ".join("PENDING" for _ in cols) + " |")
            continue
        f = fields(avg)
        print(f"| {label} | " + " | ".join(f.get(c, "-") for c in cols) + " |")


ATT = ["bpp_ori", "bpp_adv", "dbpp", "vi", "vi_msim", "t"]

table("Kodak-24 per-family trained 1001-step attacks", [
    ("hyper q4", "r5_k24_hyper.log"),
    ("cheng2020-gmm q3", "r5_k24_cheng.log"),
    ("tic q3", "r5_k24_tic.log"),
    ("nlaic q3", "r5_k24_nlaic_rerun.log"),  # first run: worker crash @kodim03
    ("invcompress q3", "r5_k24_invcompress_rescue.log"),  # 1st run: crash @kodim04
    ("fic q3 (best-of-2)", "r5_k24_fic.log"),
    ("hific q1", "r5_k24_hific.log"),
], ATT)

table("Kodak-24 RD eval + baselines", [
    ("hyper q4 trained", "r5_k24_test_hyper.log"),
], ["bpp", "psnr", "msim", "msim_dB", "t"])

table("Kodak-24 defenses (hyper q4 trained, 1001 steps)", [
    ("self-ensemble (non-adaptive)", "r5_k24_defend.log"),
    ("self-ensemble (adaptive attack)", "r5_k24_defend_adv.log"),
    ("latent clip (adaptive attack)", "r5_k24_clip_adv.log"),
], ["bpp_ori", "bpp", "vi", "vi_msim", "t"])

table("Kodak-24 analyses", [
    ("random noise 1e-4", "r5_k24_noise.log"),
    ("recompression x50", "r5_k24_recompress.log"),
    ("deblur (calibrated blur 1e-3)", "r5_deblur.log"),
], ["vi_noise", "bpp", "bpp_ori", "psnr", "dpsnr", "psnr_out",
    "msim", "t"])

table("Metric axis (2-image kodim01/02, 1001 steps)", [
    ("msim-trained, L2 attack", "r5_attack_msssim_l2.log"),
    ("msim-trained, msim attack", "r5_attack_msssim_msim.log"),
    ("mse-trained, msim attack", "r5_attack_mse_msim.log"),
    ("lpips-trained q1, L2 attack", "r5_attack_lpips.log"),
], ATT)

table("Quality axis (hyper mse, 2-image, 1001 steps)", [
    ("q1", "r5_attack_hyper_q1.log"),
    ("q2", "r5_attack_hyper_q2.log"),
    ("q4", "r5_attack_hyper_q4.log"),
    ("q6", "r5_attack_hyper_q6.log"),
    ("q8", "r5_attack_hyper_q8.log"),
], ATT)

table("Gradient-sign attacks (hyper q4 trained, 2-image, 1001 steps)", [
    ("MI-FGSM", "r5_ifgsm.log"),
    ("PGD best-of-3", "r5_pgd3.log"),
], ATT)

table("Kodak-24 defenses (hyper q4 AUGMENTED ckpt, 1001 steps)", [
    ("plain attack baseline", "r5_k24aug_attack.log"),
    ("self-ensemble (non-adaptive)", "r5_k24aug_defend.log"),
    ("self-ensemble (adaptive attack)", "r5_k24aug_defend_adv.log"),
    ("latent clip (adaptive attack)", "r5_k24aug_clip_adv.log"),
], ["bpp_ori", "bpp_adv", "bpp", "dbpp", "vi", "vi_msim", "t"])
