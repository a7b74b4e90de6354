"""Device-mesh tests: sharded batch attack + mesh helpers on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.attacks.common import RDAttackConfig
from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.parallel.batch_attack import (
    make_sharded_attack_fn,
)
from imagecompression_adversarial_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_make_mesh():
    mesh = make_mesh(8, ("dp",))
    assert mesh.shape["dp"] == 8
    mesh2 = make_mesh(8, ("dp", "sp"))
    assert mesh2.shape == {"dp": 8, "sp": 1}


def test_shard_batch_places_on_devices():
    mesh = make_mesh(8)
    x = np.zeros((16, 4, 4, 3), np.float32)
    sharded = shard_batch(mesh, x)
    assert sharded.sharding == batch_sharding(mesh)
    assert len(sharded.sharding.device_set) == 8


def test_sharded_attack_matches_single_device():
    mesh = make_mesh(8)
    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    cfg = RDAttackConfig(steps=3, debug_model=True)

    xs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (8, 192, 192, 3)), np.float32
    )
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    attack = make_sharded_attack_fn(module, cfg, mesh)
    out = attack(params, xs, keys)
    assert out["vi"].shape == (8,)
    assert np.isfinite(out["vi"]).all()

    # parity with the unsharded attack on one element
    from imagecompression_adversarial_tpu.attacks.rd import make_attack_fn

    single = make_attack_fn(module, cfg)
    ref = single(params, xs[:1], keys[0])
    np.testing.assert_allclose(
        out["vi"][0], float(ref["vi"]), rtol=1e-4, atol=1e-4
    )


def test_sharded_attack_pads_ragged_batch():
    mesh = make_mesh(8)
    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    cfg = RDAttackConfig(steps=2, debug_model=True)
    xs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (5, 192, 192, 3)), np.float32
    )
    out = make_sharded_attack_fn(module, cfg, mesh)(params, xs)
    assert out["vi"].shape == (5,)


def test_batch_attack_vmap_matches_single():
    """make_batch_attack_fn == per-image attacks (vmap semantics)."""
    from imagecompression_adversarial_tpu.attacks.rd import (
        make_attack_fn,
        make_batch_attack_fn,
    )

    module = init_model("factorized", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    xs = jax.random.uniform(jax.random.PRNGKey(2), (2, 1, 64, 64, 3), jnp.float32)
    cfg = RDAttackConfig(steps=3)

    batched = make_batch_attack_fn(module, cfg)(params, xs)
    single = make_attack_fn(module, cfg)
    for i in range(2):
        res = single(params, xs[i])
        np.testing.assert_allclose(
            float(batched["vi"][i]), float(res["vi"]), rtol=1e-5
        )


def test_best_of_restarts_picks_max_vi():
    from imagecompression_adversarial_tpu.attacks.rd import (
        best_of_restarts,
        make_attack_fn,
    )

    module = init_model("factorized", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3), jnp.float32)
    cfg = RDAttackConfig(steps=3, random_restarts=3)
    attack = make_attack_fn(module, cfg)
    keys = jax.random.split(jax.random.PRNGKey(4), 3)

    best = best_of_restarts(attack, params, x, keys)
    vis = [float(attack(params, x, k)["vi"]) for k in keys]
    np.testing.assert_allclose(float(best["vi"]), max(vis), rtol=1e-6)
