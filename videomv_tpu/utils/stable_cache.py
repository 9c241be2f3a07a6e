"""Terminal-rotation-stable compile-cache keys for the axon tunnel.

Why (round-4 verdict weak #3 / PERF roadmap #7): jax's compile-cache key
folds ``backend.platform_version`` via the ``_hash_platform`` slot
(jax/_src/cache_key.py:116,334-336).  Under the tunneled TPU that string
carries the *terminal's* build identifiers::

    PJRT C API
    axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49
    TFRT TPU v5 lite
    Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709

(measured in measurements/r5/bench_diag_r5a.log).  When the tunnel terminal
rotates between a builder's warm-up run and the driver's benchmark hours
later, the ``Built on <date> cl/<n>`` line changes, every key changes, and
the driver pays a ~8-minute cold compile (BENCH_r02/BENCH_r04: compile_s
1168 / 469 on days the builder had primed the same program to ~32 s).

The axon shim's own ``_hash_accelerator_config`` wrap
(axon/register/ifrt.py:688) does NOT cover this: its axon branch gates on
``pv.startswith("axon ")`` while the device-client string starts with
``"PJRT C API\n"``, so it falls through to vanilla hashing — and the
``_hash_platform`` fold happens regardless, in a slot the shim never
touches.

Fix: re-wrap BOTH folds for axon backends to hash the platform_version
with its volatile build line stripped.  The format-version parts
(``SerializedExecutable v9; compile-cache v14; compat c49``) and the chip
generation (``TFRT TPU v5 lite``) STAY in the key, so a terminal that
changes its executable wire format still gets a distinct key (no
guaranteed-reject staged hits); a mere rebuild of the same format keys
identically and the staged executable is reused.  The accelerator slot
additionally folds ``AXON_LIBTPU_OVERRIDES`` — the Rust side reads those
flags after the key is computed, so jax's own xla-flags fold misses them
(same contract the axon shim documents for its own wrap).

Safety: on a stale hit the frontend's ``load_serialized`` validates the
``SerializedExecutable`` version and REJECTS incompatible bytes, falling
through to a real compile whose result overwrites the entry under the same
(stable) key (axon/register/ifrt.py:790-799: "If staging matched but
``load_serialized`` REJECTED the entry … write the fresh exe back").
Worst case is exactly today's cold-compile behavior, self-healing.

Best-effort by design: if jax internals moved, install() leaves the
existing behavior untouched and returns False.
"""

from __future__ import annotations

import os
import sys

_installed = False

# Lines of platform_version that rotate with the terminal build without
# changing executable compatibility.  Everything else stays in the key.
_VOLATILE_PREFIXES = ("Built on ",)


def _stable_pv(pv: str) -> str:
    return "\n".join(
        ln for ln in pv.splitlines()
        if not ln.startswith(_VOLATILE_PREFIXES)
    )


def install(verbose: bool = True) -> bool:
    """Pin the platform/accelerator folds of the compile-cache key for axon
    backends.  Call after ``import jax`` and before the first jit compile.
    Returns True if the wrap is active (idempotent)."""
    global _installed
    if _installed:
        return True
    try:
        from jax._src import cache_key as _ck
    except ImportError:
        return False
    prev_platform = getattr(_ck, "_hash_platform", None)
    prev_accel = getattr(_ck, "_hash_accelerator_config", None)
    hash_string = getattr(_ck, "_hash_string", None)
    if prev_platform is None or prev_accel is None or hash_string is None:
        return False

    def _stable_hash_platform(hash_obj, backend, *a, **kw):
        pv = getattr(backend, "platform_version", "")
        if "axon " in pv:
            hash_string(hash_obj, getattr(backend, "platform", ""))
            hash_string(hash_obj, _stable_pv(pv))
            return
        return prev_platform(hash_obj, backend, *a, **kw)

    def _stable_hash_accel(hash_obj, accelerators, *a, **kw):
        dev = accelerators.flat[0] if getattr(accelerators, "size", 0) else None
        pv = getattr(getattr(dev, "client", None), "platform_version", "")
        if "axon " in pv:
            hash_string(hash_obj, _stable_pv(pv))
            # Rust compile_override_flags reads this env after the key is
            # computed; fold it here like the axon shim does (its "axov2"
            # salt kept for key compatibility with shim-keyed entries).
            hash_obj.update(
                b"axov2" + os.environ.get("AXON_LIBTPU_OVERRIDES", "").encode()
            )
            return
        return prev_accel(hash_obj, accelerators, *a, **kw)

    _ck._hash_platform = _stable_hash_platform
    _ck._hash_accelerator_config = _stable_hash_accel
    _installed = True
    if verbose:
        sys.stderr.write(
            "[stable-cache] axon compile-cache key pinned "
            "(platform_version build line stripped)\n"
        )
    return True
