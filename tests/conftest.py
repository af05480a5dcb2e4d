"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per the SURVEY §4 test
strategy, distributed logic is validated on
``--xla_force_host_platform_device_count=8`` CPU devices instead. These
environment variables must be set before JAX is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
