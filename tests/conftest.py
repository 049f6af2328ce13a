"""Test configuration: force the CPU backend with a virtual 8-device mesh, x64 on.

Note: this environment's sitecustomize registers a remote TPU ("axon")
backend at interpreter startup and sets JAX_PLATFORMS=axon, so we must
override the config explicitly here -- os.environ alone is too late.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# cache dir exclusive to the test context: compile-cache entries written by
# processes with different XLA flag sets (e.g. ones where the axon TPU
# plugin initialized) are not safely loadable here -- mixing them produced
# machine-feature mismatch warnings and futex-deadlocked loads.
# Durable (in-repo, gitignored) rather than /tmp: a reboot otherwise wipes
# it and the next fast-gate run pays every compile again (~4 minutes).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"
