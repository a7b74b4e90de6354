"""Export trained params from an orbax training checkpoint to a compact
msgpack demo checkpoint (float16 by default — half the repo footprint,
ADVICE r2; `runtime.load_model` restores the compute dtype on load).

Usage:
  python scripts/export_ckpt.py <ckpt_dir_or_best_loss_dir> -m tic -q 3 \
      -o ckpts/demo/tic-q3-mse-synthetic.msgpack [--fp32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", help="training ckpt dir (uses its best_loss/ "
                                     "if present) or a best_loss dir itself")
    ap.add_argument("-m", dest="model", required=True)
    ap.add_argument("-q", dest="quality", type=int, required=True)
    ap.add_argument("-o", dest="out", required=True)
    ap.add_argument("--fp32", action="store_true",
                    help="store float32 (default: float16)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from imagecompression_adversarial_tpu.models import init_model, init_params
    from imagecompression_adversarial_tpu.runtime import save_params
    from imagecompression_adversarial_tpu.train.step import create_train_state

    module = init_model(args.model, args.quality)
    params = init_params(module, jax.random.PRNGKey(0))
    state, _ = create_train_state(module, params)

    path = args.ckpt_dir
    best = os.path.join(path, "best_loss")
    if os.path.isdir(best):
        path = best
    template = {
        "state": {
            "params": state.params,
            "opt_state": state.opt_state,
            "aux_opt_state": state.aux_opt_state,
            "step": state.step,
        },
        "extra": {"epoch": 0, "loss": 0.0, "lr": 0.0},
    }
    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(path), template
    )
    save_params(
        restored["state"]["params"], args.out,
        dtype=None if args.fp32 else jnp.float16,
    )
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"exported {args.out} ({size_mb:.1f} MB, "
          f"{'fp32' if args.fp32 else 'fp16'}) "
          f"from step {int(restored['state']['step'])} "
          f"loss {restored['extra'].get('loss')}")


if __name__ == "__main__":
    main()
