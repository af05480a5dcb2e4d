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
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in xla_flags:
    # XLA:CPU splits each module for PARALLEL LLVM codegen by default;
    # on this 1-core box the suite segfaults stochastically inside
    # backend_compile_and_load (r3+r4: six crashes at unrelated tests,
    # all green in isolation, persistent cache on or off). Serializing
    # codegen removes the concurrency; tests/run_suite.py additionally
    # retries a crashed batch once.
    xla_flags = (xla_flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = xla_flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: OFF by default for the suite
# (VERDICT r3 "what's weak" 6, revisited in r4). With the cache enabled,
# full-suite runs segfault intermittently inside XLA:CPU
# compile/cache-write paths — r3 saw three crashes at three different
# tests; r4 reproduced two more even with a high write threshold and a
# CPU-feature-keyed cache dir, while r3 verified the suite completes
# with caching suppressed (409 passed). The XLA:CPU AOT cache in this
# jax build also warns on every load that the persisted machine config
# does not match the host ("could lead to execution errors such as
# SIGILL"). Repeat-run speed is the price; opt back in with
# CLIP_PPO_TEST_JAX_CACHE=/path for local iteration on a box where it
# behaves.
_cache_dir = os.environ.get("CLIP_PPO_TEST_JAX_CACHE", "")
if _cache_dir:
    # Key the cache by the host's CPU features: XLA:CPU persists AOT
    # results specialized to the compile machine, and LOADING an entry
    # built on a host with different features can SIGILL/segfault ("This
    # could lead to execution errors such as SIGILL" — the cpu_aot_loader
    # warning observed before each r3/r4 suite crash). A fleet-scheduled
    # box can wake up on different hardware between runs, so the dir name
    # carries a fingerprint and stale caches are simply never read.
    import hashlib

    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
        _cache_dir += "_" + hashlib.md5(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 8.0)
    except Exception:  # older jax without the knobs — caching is best-effort
        pass
