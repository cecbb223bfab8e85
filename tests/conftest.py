"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (standard JAX fake-device trick).

This environment's sitecustomize imports jax and registers the 'axon' TPU
plugin at *interpreter startup*; initializing that backend performs a
multi-minute remote handshake. We force the CPU platform and deregister the
axon factory so no test ever touches it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize already imported jax with JAX_PLATFORMS=axon cached in its
# config default — override through the config API, not just the env
import jax

jax.config.update("jax_platforms", "cpu")
