import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is exercised
# without TPU hardware (bench runs on the real chip outside pytest). Force cpu: the
# environment may set JAX_PLATFORMS to a hardware backend globally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
