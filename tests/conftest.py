import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is exercised
# without TPU hardware (bench runs on the real chip outside pytest).
#
# Ordering matters in this environment: sitecustomize imports jax at interpreter
# startup (before conftest), so jax has already read JAX_PLATFORMS from the
# environment - mutating os.environ here is NOT enough. jax.config.update works
# as long as no backend has been initialized yet. XLA_FLAGS is read at backend
# initialization, so the env var is still effective here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend; got " + jax.devices()[0].platform)
assert len(jax.devices()) >= 8, "expected the virtual 8-device CPU mesh"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode Pallas tests (minutes each on XLA:CPU); "
        "deselect with -m 'not slow' for a quick pass — the full suite "
        "including these is the merge gate")
