"""Pallas GDN tile sweep vs XLA fusion (round-1 lead: kernel lost 1.9ms vs
1.1ms at (1, 384, 256, 192); round-4 status: kernel demoted to
scripts/pallas_gdn.py, shipping GDN is plain XLA).  Sweeps fp32 AND bf16
(the one untried config from the round-3 verdict).

Run on the real chip: python scripts/perf_gdn_tiles.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # pallas_gdn

import jax
import jax.numpy as jnp


def main():
    c = 192
    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"--- dtype {jnp.dtype(dtype).name} ---", flush=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 384, 256, c), dtype)
        gamma = (jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (c, c))) * 0.1).astype(dtype)
        beta = jnp.ones((c,), dtype)

        def xla_gdn(x, gamma, beta):
            n = x.reshape(-1, c)
            norm = (n * n) @ gamma.T + beta[None, :]
            return (n * jax.lax.rsqrt(norm)).reshape(x.shape)

        def timeit(name, fn, iters=50):
            jfn = jax.jit(fn)
            out = jfn(x, gamma, beta)
            jax.block_until_ready(out)
            # time a scan of iters applications to amortize dispatch (axon
            # adds ~400us/dispatch — CLAUDE.md)
            def scanned(x, gamma, beta):
                def body(carry, _):
                    o = fn(carry, gamma, beta)
                    return (o * jnp.asarray(0.999, o.dtype)
                            + jnp.asarray(1e-3, o.dtype)), None
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
            timeit(f"pallas tile={tile}",
                   lambda x, g, b, t=tile: _pallas(x, g, b, t))


def _pallas(x, gamma, beta, tile):
    from pallas_gdn import _gdn_forward

    c = x.shape[-1]
    return _gdn_forward(x.reshape(-1, c), gamma, beta, False, False, tile).reshape(
        x.shape
    )


if __name__ == "__main__":
    main()
