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
# identity + jax/jaxlib versions: XLA:CPU AOT executables cached on a host
# with different features (e.g. amx/avx512 extras) load elsewhere with only
# a warning and then abort/SIGILL mid-test — sessions migrate between
# machines (round-4 postmortem: the final full-suite run died with `Fatal
# Python error: Aborted` inside a cached executable even though the cache
# was keyed by cpuinfo *flags* alone, so the key now also pins the model
# name and library versions, and a canary subprocess below self-heals the
# remaining cases by wiping a cache the current host cannot execute).
def _host_cache_suffix():
    import hashlib

    parts = [jax.__version__]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except ImportError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    parts.append(line.split(":", 1)[1].strip())
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:8] if parts else "generic"


_CACHE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..",
                 f".jax_cache_cpu_{_host_cache_suffix()}")
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _canary_cache_dir():
    """Session-start canary: load-and-run a cached executable in a THROWAWAY
    subprocess. If the subprocess dies on a signal (SIGABRT/SIGILL — the
    stale-AOT-executable failure mode), wipe the cache so this session
    recompiles instead of dying 40 minutes into the suite."""
    import shutil
    import subprocess
    import sys

    if not os.path.isdir(_CACHE_DIR) or not os.listdir(_CACHE_DIR):
        return  # nothing cached, nothing to poison us
    prog = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        f"os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','');"
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"jax.config.update('jax_compilation_cache_dir', {_CACHE_DIR!r});"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0);"
        "import jax.numpy as jnp;"
        "f=jax.jit(lambda x: (x @ x.T).sum());"
        "print(float(f(jnp.ones((128,128)))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, timeout=120
        )
    except subprocess.TimeoutExpired:
        return  # slow ≠ poisoned; leave the cache alone
    if r.returncode < 0:  # killed by a signal: cache is hostile to this host
        sys.stderr.write(
            f"[conftest] cache canary died with signal {-r.returncode}; "
            f"wiping {_CACHE_DIR}\n"
        )
        shutil.rmtree(_CACHE_DIR, ignore_errors=True)


_canary_cache_dir()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "parity: numerical parity tests against torch reference math"
    )
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy tests excluded from the fast tier "
        "(pre-commit gate: pytest -m 'not slow'; full suite pre-snapshot)",
    )
