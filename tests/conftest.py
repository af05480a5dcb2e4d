"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per the SURVEY §4 test
strategy, distributed logic is validated on
``--xla_force_host_platform_device_count=8`` CPU devices instead.

Note: this environment's axon sitecustomize force-registers the TPU
platform and sets ``jax_platforms='axon,cpu'`` *after* env-var parsing, so
``JAX_PLATFORMS=cpu`` alone is ignored — the config must be updated after
importing jax (and before any backend use).
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
