"""Probe whether the persistent compile cache hits across processes on the
tunneled TPU backend.

Run twice in separate processes:
    python scripts/cache_probe.py /tmp/probe_cache
First run compiles and records compile time; second run should be ~instant
if the cache key is stable across processes.  `--explain` turns on
jax_explain_cache_misses so the miss reason lands in the log.
"""
import sys
import time

cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_cache"

import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if "--explain" in sys.argv:
    jax.config.update("jax_explain_cache_misses", True)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)


@jax.jit
def probe(x):
    # big enough to take >1s to compile: a small scan of matmuls
    def body(c, _):
        return jnp.tanh(c @ c) + 0.1 * c, None

    out, _ = jax.lax.scan(body, x, None, length=8)
    return out


x = jnp.ones((512, 512), jnp.float32)
t0 = time.time()
probe(x).block_until_ready()
print(f"first-call time: {time.time() - t0:.2f}s", flush=True)
