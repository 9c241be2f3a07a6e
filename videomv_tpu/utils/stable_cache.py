"""Terminal-rotation-stable compile-cache keys for the axon tunnel.

Why (round-4 verdict weak #3 / PERF roadmap #7): under the tunneled TPU the
compile cache key folds ``platform_version`` — a string carrying the
*terminal's* build identifiers (``SerializedExecutable v9; compile-cache
v14; compat c49; Built on <date> cl/<number>``, measured in
measurements/r5/bench_diag_r5a.log). When the tunnel terminal rotates
between a builder's warm-up run and the driver's benchmark hours later,
every key changes and the driver pays a ~8-minute cold compile
(BENCH_r02/BENCH_r04: compile_s 1168 / 469 on days the builder had primed
the same program to ~32 s).

Fix: re-wrap the accelerator-config slot of the cache key to fold a PINNED
string — TPU generation + the libtpu-override env the axon shim also folds
— instead of the rotating ``platform_version``. Safety: on a stale hit the
frontend's ``load_serialized`` validates the ``SerializedExecutable``
version and REJECTS incompatible bytes, falling through to a real compile
whose result overwrites the entry under the same (stable) key
(axon/register/ifrt.py ``_install_compile_cache_hooks``: "staged but
``load_serialized`` REJECTED the entry → write the fresh exe back"). Worst
case is exactly today's cold-compile behavior, once per terminal rotation,
self-healing.

Best-effort by design: if jax internals or the axon shim moved, install()
leaves the existing behavior untouched and returns False.
"""

from __future__ import annotations

import os
import sys

_installed = False


def install(verbose: bool = True) -> bool:
    """Pin the accelerator-config fold of the compile-cache key for axon
    backends. Call after ``import jax`` and before the first jit compile.
    Returns True if the wrap is active."""
    global _installed
    if _installed:
        return True
    try:
        from jax._src import cache_key as _ck
    except ImportError:
        return False
    prev = getattr(_ck, "_hash_accelerator_config", None)
    if prev is None:
        return False

    pinned = "|".join(
        (
            "videomv-stable-v1",
            os.environ.get("PALLAS_AXON_TPU_GEN", "unknown-gen"),
            # the axon shim folds this too (compile_override_flags is read
            # Rust-side after the key is computed) — keep that contract
            os.environ.get("AXON_LIBTPU_OVERRIDES", ""),
        )
    )

    def _stable_hash_accel(hash_obj, accelerators, *a, **kw):
        dev = accelerators.flat[0] if getattr(accelerators, "size", 0) else None
        pv = getattr(getattr(dev, "client", None), "platform_version", "")
        if "axon " in pv:
            hash_obj.update(pinned.encode())
            return
        return prev(hash_obj, accelerators, *a, **kw)

    _ck._hash_accelerator_config = _stable_hash_accel
    _installed = True
    if verbose:
        sys.stderr.write(f"[stable-cache] accelerator key pinned: {pinned!r}\n")
    return True
