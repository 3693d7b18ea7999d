import os

# Tests run on a virtual 8-device CPU mesh so sharding semantics are exercised
# without TPU hardware; the real chip is reserved for benchmarks.
#
# The session's sitecustomize force-sets JAX_PLATFORMS=axon (the TPU tunnel)
# in os.environ at interpreter start, so setting the env var here is not
# enough — override through the jax config, which wins over the env.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
