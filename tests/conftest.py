"""Test harness config: force an 8-device virtual CPU platform.

Sharding/mesh tests run on 8 virtual CPU devices; kernel tests use Pallas
interpret mode on CPU. Real-TPU runs happen in bench.py, not the test suite.

Note: this environment's TPU plugin (axon) overrides JAX_PLATFORMS via
``jax.config`` at interpreter startup (sitecustomize), so we must update the
config *after* importing jax, not just set the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)
from jax._src import xla_bridge as _xb  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for mesh tests"
