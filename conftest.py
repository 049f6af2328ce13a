"""Repo-root pytest configuration.

Doctests are collected from the package and docs tree (pyproject
[tool.pytest.ini_options], doctest parity with the reference's
``--doctest-modules``), so the CPU/x64 backend forcing in
tests/conftest.py must also apply at the repo root -- this environment's
sitecustomize registers a remote TPU backend at interpreter startup and
a doctest importing jax would otherwise dial the (intermittent) tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

collect_ignore = ["reference", "setup.py"]
