"""Test harness setup (SURVEY.md §5.5 "distributed tests without a cluster").

Runs the whole suite on CPU with 8 virtual XLA devices so `shard_map`
halo exchange / distributed-solver tests execute in plain pytest, and
enables x64 so parity tests against the f64 NumPy oracle are exact.
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize registers the TPU ('axon') PJRT plugin and
# force-sets jax.config jax_platforms='axon,cpu' — overriding the env
# var above.  Re-override at the *config* level (before any backend is
# touched) so the suite really runs on 8 virtual CPU devices with true
# f64; TPU execution is exercised by bench.py and the verify flow.
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "distributed tests need 8 fake devices"
