"""Pallas GDN tile sweep vs XLA fusion (round-1 lead: kernel lost 1.9ms vs
1.1ms at (1, 384, 256, 192); tune tiles / dtype or retire it).

Run on the real chip: python scripts/perf_gdn_tiles.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    from imagecompression_adversarial_tpu.ops import pallas_gdn

    c = 192
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 384, 256, c), jnp.float32)
    gamma = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (c, c))) * 0.1
    beta = jnp.ones((c,))

    def xla_gdn(x, gamma, beta):
        n = x.reshape(-1, c)
        norm = (n * n) @ gamma.T + beta[None, :]
        return (n * jax.lax.rsqrt(norm)).reshape(x.shape)

    def timeit(name, fn, iters=50):
        jfn = jax.jit(fn)
        out = jfn(x, gamma, beta)
        jax.block_until_ready(out)
        # time a scan of iters applications to amortize dispatch (axon adds
        # ~400us/dispatch — CLAUDE.md)
        def scanned(x, gamma, beta):
            def body(carry, _):
                return fn(carry, gamma, beta) * 0.999 + 1e-6, None
            return jax.lax.scan(body, x, None, length=iters)[0]
        js = jax.jit(scanned)
        out = js(x, gamma, beta)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = js(x, gamma, beta)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} {dt*1e3:7.3f} ms", flush=True)
        return dt

    timeit("xla fused", xla_gdn)
    for tile in (256, 512, 1024, 2048, 4096):
        timeit(
            f"pallas tile={tile}",
            lambda x, g, b, t=tile: pallas_gdn.gdn_fused.__wrapped__(
                x, g, b, False, False
            ) if False else _pallas(x, g, b, t),
        )


def _pallas(x, gamma, beta, tile):
    from imagecompression_adversarial_tpu.ops.pallas_gdn import _gdn_forward

    c = x.shape[-1]
    return _gdn_forward(x.reshape(-1, c), gamma, beta, False, False, tile).reshape(
        x.shape
    )


if __name__ == "__main__":
    main()
