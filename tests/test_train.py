"""Training-step tests: optimizer split, loss finiteness, multichip dryrun."""

import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.train.loss import (
    LAMBDA_MSE,
    LAMBDA_MSSSIM,
    lambda_for,
    rate_distortion_loss,
)
from imagecompression_adversarial_tpu.train.step import (
    ReduceLROnPlateau,
    create_train_state,
    quantile_labels,
)


def test_lambda_tables():
    assert len(LAMBDA_MSE) == 8 and len(LAMBDA_MSSSIM) == 8
    assert lambda_for("mse", 1) == 0.0018
    assert lambda_for("ms-ssim", 8) == 220.0


def test_rate_distortion_loss_mse():
    module = init_model("factorized", 1)
    key = jax.random.PRNGKey(0)
    params = init_params(module, key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    result = module.apply({"params": params}, x, quant_mode="noise",
                          rngs={"quant": key})
    out = rate_distortion_loss(result, x, lambda_for("mse", 1), "mse")
    for k in ("loss", "bpp_loss", "distortion"):
        assert np.isfinite(float(out[k])), k
    assert float(out["bpp_loss"]) > 0


def test_quantile_labels_select_only_quantiles():
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    labels = quantile_labels(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    marked = [jax.tree_util.keystr(p) for p, v in flat if v == "aux"]
    assert marked == ["['entropy_bottleneck']['quantiles']"]
    assert all(v in ("aux", "main") for _, v in flat)


def test_reduce_lr_on_plateau():
    sched = ReduceLROnPlateau(lr=1e-4, patience=2)
    lrs = [sched.step(1.0) for _ in range(6)]  # no improvement after first
    assert lrs[0] == 1e-4 and lrs[-1] < 1e-4


def test_train_step_updates_params_and_quantiles():
    module = init_model("factorized", 1)
    key = jax.random.PRNGKey(0)
    params = init_params(module, key)
    state, train_step = create_train_state(module, params)

    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    step = jax.jit(lambda s, b, r: train_step(s, b, r, 1e-4, 0.01, "mse"))
    new_state, logs = step(state, batch, jax.random.PRNGKey(2))

    assert np.isfinite(float(logs["loss"]))
    assert np.isfinite(float(logs["aux_loss"]))
    # conv params moved (main optimizer)
    k0 = params["g_a_0"]["kernel"]
    k1 = new_state.params["g_a_0"]["kernel"]
    assert np.abs(np.asarray(k1 - k0)).max() > 0
    # quantiles moved (aux optimizer)
    q0 = params["entropy_bottleneck"]["quantiles"]
    q1 = new_state.params["entropy_bottleneck"]["quantiles"]
    assert np.abs(np.asarray(q1 - q0)).max() > 0
    assert int(new_state.step) == 1


def test_multichip_dryrun_8_devices():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)


def test_rate_distortion_loss_lpips_branch_differentiable():
    """The lpips metric branch (ref train.py:92-94) is finite and yields
    nonzero gradients through the reconstruction — covers the in-framework
    LPIPS head (incl. the new input-scaling params) inside the train loss."""
    import jax
    import jax.numpy as jnp

    from imagecompression_adversarial_tpu.train.loss import rate_distortion_loss

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)

    def loss_of(x_hat):
        result = {
            "x_hat": x_hat,
            "likelihoods": {"y": jnp.full((1, 4, 4, 8), 0.5, jnp.float32)},
        }
        out = rate_distortion_loss(result, x, lmbda=1.0, metric="lpips")
        return out["loss"]

    x_hat0 = jnp.clip(x + 0.1, 0.0, 1.0)
    val, grad = jax.value_and_grad(loss_of)(x_hat0)
    assert jnp.isfinite(val)
    assert float(jnp.abs(grad).max()) > 0.0
