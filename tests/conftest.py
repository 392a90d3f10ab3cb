"""Test config: force an 8-device virtual CPU mesh.

The reference never tests its DDP paths without real GPUs (SURVEY.md §4);
here every sharded path is exercised on a virtual 8-device CPU mesh.

Note: this image's axon sitecustomize force-sets
``jax_platforms="axon,cpu"`` at interpreter start (overriding
``JAX_PLATFORMS`` from the environment), so we must override the *config*
after importing jax, not just the env var.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the conv/SPMD graphs dominate test wall time
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()
