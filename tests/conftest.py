"""Test config: force an 8-device virtual CPU mesh (SURVEY.md §4 item 4).

Must set env vars BEFORE jax is imported anywhere in the test process.
"""

import os

# Force-override: the session environment pins JAX_PLATFORMS=axon (the
# real TPU tunnel); tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize calls register() at interpreter start and pins
# jax.config.jax_platforms to "axon,cpu"; force it back to CPU here
# (before any backend is initialized by a test import).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
