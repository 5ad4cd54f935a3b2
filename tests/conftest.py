"""Test harness config: force an 8-device virtual CPU platform.

Sharding/mesh tests run on 8 virtual CPU devices; kernel tests use Pallas
interpret mode on CPU. Real-TPU runs happen in bench.py, not the test suite.

Environment notes (axon TPU relay):
  * the TPU plugin registers itself in every python process via
    sitecustomize and sets jax_platforms via jax.config — so we must both
    update the config after import AND deregister the backend factory, or
    the first backend query would *initialize the remote TPU client and
    claim the single-tenant chip* for the whole pytest run, starving any
    concurrent benchmark process;
  * alternatively run CPU-only work with PALLAS_AXON_POOL_IPS= (empty) so
    the plugin never registers.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)
from jax._src import xla_bridge as _xb  # noqa: E402

# Drop the axon backend factory so no test can initialize/claim the TPU.
try:
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
jax.config.update("jax_platforms", "cpu")
if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for mesh tests"
