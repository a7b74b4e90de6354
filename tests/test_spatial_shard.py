"""GSPMD row-sharded forward/attack == single-device numerics (no seams).

The overlap-tile path (tests/test_spatial.py) is approximate by design;
this path must be exact up to reduction reordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from imagecompression_adversarial_tpu.attacks import RDAttackConfig
from imagecompression_adversarial_tpu.attacks.rd import make_attack_fn
from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.parallel.spatial_shard import (
    make_spatial_attack_fn,
    make_spatial_forward,
)


@pytest.fixture(scope="module")
def setup():
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 128, 3), jnp.float32)
    return module, params, x


def _sp_mesh(n=4):
    devs = jax.devices("cpu")
    assert len(devs) >= n
    return Mesh(np.array(devs[:n]), ("sp",))


def test_row_sharded_forward_matches_single_device(setup):
    module, params, x = setup
    mesh = _sp_mesh(4)
    fwd = make_spatial_forward(module, mesh)
    out_sharded = fwd(params, x)

    ref = module.apply({"params": params}, x, quant_mode="dequantize")
    np.testing.assert_allclose(
        np.asarray(out_sharded["x_hat"]), np.asarray(ref["x_hat"]),
        rtol=0, atol=1e-5,
    )
    # rate term reduces across shards (psum) — scalar must agree too
    for k in ref["likelihoods"]:
        np.testing.assert_allclose(
            float(jnp.sum(jnp.log(out_sharded["likelihoods"][k]))),
            float(jnp.sum(jnp.log(ref["likelihoods"][k]))),
            rtol=1e-4,  # reduction reassociation across shards
        )


def test_row_sharded_attack_matches_single_device(setup):
    module, params, x = setup
    mesh = _sp_mesh(4)
    cfg = RDAttackConfig(steps=5, noise_threshold=1e-4)
    sharded = make_spatial_attack_fn(module, cfg, mesh)
    res_sh = sharded(params, x)

    res_ref = make_attack_fn(module, cfg)(params, x)
    # deterministic scan (key=None -> zero noise init): metrics must agree
    for k in ("vi", "mse_in", "bpp_ori"):
        np.testing.assert_allclose(
            float(res_sh[k]), float(res_ref[k]), rtol=1e-4, atol=1e-6
        )
    # and GSPMD must KEEP the scan partitioned (no silent all-gather):
    # the adversarial image comes back row-sharded
    spec = res_sh["im_"].sharding.spec
    assert tuple(spec) == (None, "sp"), spec


def test_row_sharding_rejects_unaligned_height(setup):
    module, params, _ = setup
    mesh = _sp_mesh(4)
    fwd = make_spatial_forward(module, mesh)
    bad = jnp.zeros((1, 192, 128, 3), jnp.float32)  # 192 % (4*64) != 0
    with pytest.raises(AssertionError):
        fwd(params, bad)
