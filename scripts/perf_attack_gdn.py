"""Attack throughput with the Pallas fused GDN vs XLA GDN (both remat on).

The only trustworthy comparison through the axon relay is end-to-end:
sub-ms single-op timings are dominated by async-dispatch noise
(RESULTS.md round 2).  Toggle: ICAT_PALLAS_GDN=1 environment switch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def run(steps=1001):
    from imagecompression_adversarial_tpu.attacks import RDAttackConfig, make_attack_fn
    from imagecompression_adversarial_tpu.models import init_model, init_params

    jax.config.update("jax_default_matmul_precision", "default")
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 768, 3), jnp.float32)
    attack = make_attack_fn(module, RDAttackConfig(steps=steps))
    res = attack(params, x)
    jax.block_until_ready(res["vi"])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = attack(params, x)
        jax.block_until_ready(res["vi"])
        best = min(best, time.perf_counter() - t0)
    tag = "pallas" if os.environ.get("ICAT_PALLAS_GDN") == "1" else "xla"
    print(f"attack gdn={tag:6s} {steps/best:8.1f} steps/s ({best:.2f}s)  "
          f"vi={float(res['vi']):.3f}", flush=True)


if __name__ == "__main__":
    run()
