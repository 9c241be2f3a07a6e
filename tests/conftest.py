"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment exports ``JAX_PLATFORMS=axon`` (a tunneled TPU plugin) which
overrides plain env-var settings, so we must both set the env *and* update
jax.config after import (SURVEY.md §4: mesh/sharding tests use the CPU
device-count override instead of real multi-host TPU).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# keep fp32 matmuls honest on all backends (parity tests vs torch)
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the suite is compile-bound on the 1-core host;
# warm runs drop from ~15 min to ~2 min. The dir is keyed by the host's CPU
# feature set: XLA:CPU AOT executables cached on a host with different
# features (e.g. amx/avx512 extras) load here with only a warning and then
# abort/SIGILL mid-test — sessions migrate between machines, so each
# feature set gets its own cache.
def _host_cache_suffix():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "generic"


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..",
                 f".jax_cache_cpu_{_host_cache_suffix()}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "parity: numerical parity tests against torch reference math"
    )
