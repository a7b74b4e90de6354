"""CLI: adversarial-noise transferability matrices.

Mirrors ``python transfer_noise.py -s <targets> -s2 <sources>`` and
``--cross-model`` (`/root/reference/transfer_noise.py:98-176`): cross-image
VI matrix for one model, or the model x model transfer matrix over
{factorized, hyper, context, cheng2020}.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..attacks import RDAttackConfig, make_attack_fn
from ..analysis import (
    cross_image_matrix,
    cross_model_matrix,
    make_transfer_eval_fn,
    plot_matrix,
)
from ..config import Config, apply_precision, build_parser
from ..io.image import list_images, read_image
from ..runtime import load_model


def run(cfg, source2=None, cross_model=False, cross_specs=None) -> np.ndarray:
    apply_precision(cfg)

    att_kwargs = dict(
        steps=cfg.steps, lr=cfg.lr_attack, noise_threshold=cfg.noise,
        epsilon=cfg.epsilon, clamp=cfg.clamp,
    )

    if cross_model:
        if cross_specs:
            # trained-checkpoint matrix: 'arch:quality:ckpt' entries
            specs = []
            for entry in cross_specs.split(","):
                arch, q, ck = entry.split(":", 2)
                specs.append((arch, int(q), ck or None))
        else:
            specs = [(a, min(cfg.quality, 6), cfg.checkpoint)
                     for a in ("factorized", "hyper", "context", "cheng2020")]
        # Lazy legs: each thunk loads its model when the matrix needs it and
        # analysis.cross_model_matrix frees it afterwards — 6-7 trained
        # families' params + jitted attack scans do NOT fit in one chip's
        # HBM simultaneously (the eager round-5 run died ResourceExhausted).
        def make_attack_thunk(arch, q, ck):
            def thunk():
                c = dataclasses.replace(cfg, model=arch, quality=q, checkpoint=ck)
                module, params = load_model(c)
                if arch == "fic":
                    # fic's zero-init noise sits at an exact critical point
                    # (models/fic.py attack note): as a transfer SOURCE it
                    # would contribute all-zero noise rows.  Run a genuine
                    # best-of-2 restart (uniform(±1e-2) init per key, highest
                    # VI kept) so the row is comparable to `-random 2`
                    # attack_rd runs; the reference's own random init exists
                    # only as a commented-out line (attack_fic.py:58-59) and
                    # its live init is zeros.
                    import jax

                    from ..attacks import best_of_restarts

                    inner = make_attack_fn(
                        module, RDAttackConfig(**att_kwargs, random_restarts=2)
                    )
                    # host-looped: the vmapped 768x512 fic best-of-2 program
                    # reproducibly crashes the TPU worker (attacks/rd.py note)
                    afn = lambda p, x, _f=inner: best_of_restarts(
                        _f, p, x, jax.random.split(jax.random.PRNGKey(0), 2),
                        impl="host",
                    )
                else:
                    afn = make_attack_fn(module, RDAttackConfig(**att_kwargs))
                return afn, params

            return thunk

        def make_eval_thunk(arch, q, ck):
            def thunk():
                c = dataclasses.replace(cfg, model=arch, quality=q, checkpoint=ck)
                module, params = load_model(c)
                return make_transfer_eval_fn(module), params

            return thunk

        attacks = [make_attack_thunk(*s) for s in specs]
        evals = [make_eval_thunk(*s) for s in specs]
        labels = [f"{arch}-q{q}" for arch, q, _ in specs]
        images = [read_image(f)[0] for f in list_images(cfg.source)]
        matrix = cross_model_matrix(attacks, evals, images)
        print("cross-model transfer matrix (rows: attacked, cols: evaluated):")
        print("models:", " ".join(labels))
        print(np.round(matrix, 2))
        np.save("transfer_cross_model.npy", matrix)
        plot_matrix(matrix, "transfer_cross_model.pdf")
        return matrix

    module, params = load_model(cfg)
    attack = make_attack_fn(module, RDAttackConfig(**att_kwargs))
    eval_fn = make_transfer_eval_fn(module)
    src_files = list_images(source2 or cfg.source)
    images = [read_image(f)[0] for f in src_files]
    matrix = cross_image_matrix(attack, eval_fn, params, images)
    print("cross-image transfer VI matrix:")
    print(np.round(matrix, 2))
    tag = f"{cfg.model}_{cfg.quality}_{cfg.metric}_"
    np.save(tag + "transfer.npy", matrix)
    plot_matrix(matrix, tag + "transfer.pdf")
    return matrix


def main(argv=None):
    parser = build_parser()
    parser.add_argument("-s2", "--source2", type=str, default=None)
    parser.add_argument("--cross-model", dest="cross_model", action="store_true")
    parser.add_argument("-cross", dest="cross_specs", type=str, default=None,
                        help="comma-separated arch:quality:ckpt entries for a "
                             "trained-checkpoint cross-model matrix")
    ns = parser.parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(Config)})
    run(cfg, source2=ns.source2, cross_model=ns.cross_model,
        cross_specs=ns.cross_specs)


if __name__ == "__main__":
    main()
