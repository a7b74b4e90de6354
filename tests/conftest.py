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

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Parity tests compare against float64 torch references; the default
# (bf16-class) conv precision is a perf knob for the TPU attack path, not
# for correctness tests.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache keeps repeated test runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
