"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

Per the build plan (SURVEY §4 item 4), multi-chip sharding is tested on a
virtual CPU mesh; real-TPU execution is exercised by bench.py / the driver.

Note: this environment's axon sitecustomize overrides JAX_PLATFORMS env, so
the platform must be forced programmatically after importing jax.
"""

import os
import sys

# Tests never use the axon TPU backend; scrub its trigger so *spawned child
# processes* (multiprocess tests) skip the axon register() handshake, which
# can hang at interpreter start when the tunneled chip is busy/leased.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
