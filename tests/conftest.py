"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (SURVEY §4 implication (d)).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The sandbox's axon site-hook forces platforms back to "axon,cpu"; override
# post-import so tests really run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Parity tests compare against float64 torch references; the default
# (bf16-class) conv precision is a perf knob for the TPU attack path, not
# for correctness tests.
jax.config.update("jax_default_matmul_precision", "highest")

# NOTE: no persistent compilation cache here — the sandbox's CPU AOT cache
# is machine-feature-sensitive and reloading entries across hosts emits
# SIGILL warnings.
