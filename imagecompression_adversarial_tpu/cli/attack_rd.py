"""CLI: the canonical RD distortion attack over an image corpus.

Mirrors ``python attack_rd.py -m hyper -q 1 -s 'kodim*.png' ...``
(`/root/reference/attack_rd.py:646-720`, README.md:5-9): per-image report of
``bpp_ori bpp_adv dbpp vi vi_msim time`` plus the AVG line, and optional
``_advin/_advout/_noise`` PNG artifacts.

TPU differences: images are attacked in device batches (``-attack_batch``),
random restarts are a vmapped axis, and the whole 1001-step loop is one
compiled program — wall-clock per image is the headline benchmark
(BASELINE.md).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..attacks import RDAttackConfig, best_of_restarts, make_attack_fn
from ..config import apply_precision, parse_config
from ..io.image import list_images, read_image, write_image
from ..runtime import load_model


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    att_cfg = RDAttackConfig(
        steps=cfg.steps,
        lr=cfg.lr_attack,
        noise_threshold=cfg.noise,
        epsilon=cfg.epsilon,
        att_metric=cfg.att_metric,
        clamp=cfg.clamp,
        random_restarts=cfg.random,
        debug_model=(cfg.model == "debug"),
        pad=cfg.pad,
        padding_mode=cfg.padding_mode,
        phase_space_loss={"auto": None, "on": True, "off": False}[
            cfg.phase_space
        ],
        split_eval=cfg.split_eval,
        two_phase_impl=cfg.two_phase_impl,
    )
    attack = make_attack_fn(module, att_cfg)

    files = list_images(cfg.source)
    if not files:
        raise SystemExit(f"no images match source glob {cfg.source!r}")

    print("==================== ATTACK SETTINGS ====================")
    print(f"[ IMAGE ]: {cfg.source} -> {cfg.target}")
    print(f"Attack Loss Metric: {cfg.att_metric}")
    print(f"Noise Threshold (L2): {cfg.noise} (epsilon={cfg.epsilon})")
    print(f"{cfg.steps} Steps")
    print("=========================================================")

    model_tag = f"{cfg.model}_{cfg.quality}_{cfg.metric}_"
    out_dir = "./attack/results/"

    sums = {"bpp_ori": 0.0, "bpp": 0.0, "vi": 0.0, "vi_msim": 0.0, "t": 0.0}
    n = 0

    def report(name, res, im, h, w, dt):
        nonlocal n
        dbpp = (res["bpp"] - res["bpp_ori"]) / res["bpp_ori"]
        print(
            f"{name}: bpp_ori {res['bpp_ori']:.4f} bpp_adv {res['bpp']:.4f} "
            f"dbpp {dbpp:+.4f} vi {res['vi']:.4f} vi_msim {res['vi_msim']:.4f} "
            f"t {dt:.2f}s"
        )
        if cfg.debug or cfg.target:
            os.makedirs(out_dir, exist_ok=True)
            stem = out_dir + model_tag + os.path.splitext(name)[0]
            write_image(res["im_"], f"{stem}_advin.png", h, w)
            write_image(res["output_"], f"{stem}_advout.png", h, w)
            noise_img = np.clip(res["im_"] - im + 0.5, 0.0, 1.0)
            write_image(noise_img, f"{stem}_noise.png", h, w)
        for k in ("bpp_ori", "bpp", "vi", "vi_msim"):
            sums[k] += float(res[k])
        sums["t"] += dt
        n += 1

    if cfg.attack_batch > 1 and cfg.random <= 1:
        # TPU batch mode: vmapped attack over same-shape image groups
        # (replaces the reference's per-image loop, `attack_rd.py:654-681`)
        from ..attacks import make_batch_attack_fn

        batched = make_batch_attack_fn(module, att_cfg)
        groups = {}
        for path in files:
            im, h, w = read_image(path)
            groups.setdefault(im.shape, []).append((path, im, h, w))
        for shape, items in groups.items():
            for i in range(0, len(items), cfg.attack_batch):
                chunk = items[i : i + cfg.attack_batch]
                xs = np.stack([c[1] for c in chunk]).astype(np.float32)
                t0 = time.time()
                res_b = batched(params, xs)
                res_b = jax.tree_util.tree_map(np.asarray, res_b)
                dt = (time.time() - t0) / len(chunk)
                for j, (path, im, h, w) in enumerate(chunk):
                    res = jax.tree_util.tree_map(lambda a: a[j], res_b)
                    report(os.path.basename(path), res, im, h, w, dt)
    else:
        for path in files:
            im, h, w = read_image(path)
            im = np.asarray(im, np.float32)
            t0 = time.time()
            if cfg.random > 1:
                keys = jax.random.split(jax.random.PRNGKey(n), cfg.random)
                res = best_of_restarts(
                    attack, params, im, keys, impl=cfg.restart_impl
                )
            else:
                res = attack(params, im)
            res = jax.tree_util.tree_map(np.asarray, res)
            report(os.path.basename(path), res, im, h, w, time.time() - t0)

    if cfg.trace:
        # profiler observability (SURVEY §5): rerun the last image's attack
        # under jax.profiler with the compile already cached, so the trace
        # shows steady-state device execution only
        im, h, w = read_image(files[-1])
        im = np.asarray(im, np.float32)
        with jax.profiler.trace(cfg.trace):
            res = attack(params, im)
            jax.block_until_ready(res["vi"])
        print(f"[trace] jax.profiler trace written to {cfg.trace}")

    avg = {k: v / n for k, v in sums.items()}
    avg["dbpp"] = (avg["bpp"] - avg["bpp_ori"]) / avg["bpp_ori"]
    print(
        f"AVG: bpp_ori {avg['bpp_ori']:.4f} bpp_adv {avg['bpp']:.4f} "
        f"dbpp {avg['dbpp']:+.4f} vi {avg['vi']:.4f} vi_msim {avg['vi_msim']:.4f} "
        f"t {avg['t']:.2f}s"
    )
    return avg


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.model == "fic" and cfg.random <= 1:
        # fic decodes the un-quantized latent, so zero-init noise sits at an
        # exact critical point and never moves (models/fic.py attack note)
        print(
            "WARNING: -m fic with zero noise init cannot leave its critical "
            "point (vi stays 0); use -random 2 or more for uniform init"
        )
    if cfg.quality < 1:  # quality sweep, ref `attack_rd.py:706-715`
        from ..models import quality_range

        lo, hi = quality_range(cfg.model)
        for q in range(lo, hi + 1):
            cfg.quality = q
            run(cfg)
    else:
        run(cfg)


if __name__ == "__main__":
    main()
