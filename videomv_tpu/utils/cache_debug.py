"""Observability for the axon-tunnel compile cache (VIDEOMV_CACHE_DEBUG=1).

Under the axon IFRT tunnel, JAX's own persistent-cache layer is disabled
by the plugin (``supports_executable_serialization=False`` →
``cache_key=None``), so ``jax_explain_cache_misses`` can never fire.  The
plugin replaces it with: disk ``cache.get`` → in-process staging keyed on
``blake3(vhlo || compile_options)`` → the Rust frontend consumes staged
bytes on exact match, else silently compiles cold.  Every step of that
pipeline is invisible client-side except through timing.

``install()`` wraps the two observable seams — ``cc._get_cache().get/put``
and the module-level ``get_cache_key`` — and prints one line per event to
stderr, so a bench/profile run records *which* programs hit, missed, or
were re-written (a re-write of an existing key after a long compile means
the staged executable was REJECTED by the frontend — the flaky case).

Usage: ``VIDEOMV_CACHE_DEBUG=1 python bench.py``; or call
``install()`` before the first jit compile.
"""

from __future__ import annotations

import sys
import time

_installed = False


def install() -> None:
    global _installed
    if _installed:
        return
    _installed = True

    from jax._src import compilation_cache as cc

    _orig_get_cache = cc._get_cache

    def _log(msg: str) -> None:
        sys.stderr.write(f"[cache-debug {time.strftime('%H:%M:%S')}] {msg}\n")
        sys.stderr.flush()

    class _WrappedCache:
        def __init__(self, inner):
            self._inner = inner

        def get(self, key: str):
            t0 = time.monotonic()
            blob = self._inner.get(key)
            dt = time.monotonic() - t0
            if blob is None:
                _log(f"MISS  {key[:16]}…  ({dt*1e3:.0f} ms)")
            else:
                _log(f"HIT   {key[:16]}…  {len(blob)/1e6:.1f} MB ({dt*1e3:.0f} ms) — staged; "
                     "a >5 s compile after this line = frontend REJECTED the staged exe")
            return blob

        def put(self, key: str, blob: bytes):
            _log(f"WRITE {key[:16]}…  {len(blob)/1e6:.1f} MB")
            return self._inner.put(key, blob)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    _wrapped: dict[int, _WrappedCache] = {}

    def _get_cache_wrapped(backend):
        inner = _orig_get_cache(backend)
        if inner is None:
            _log("cache unavailable (_get_cache → None): persistent cache OFF for this backend")
            return None
        w = _wrapped.get(id(inner))
        if w is None:
            w = _WrappedCache(inner)
            _wrapped[id(inner)] = w
        return w

    cc._get_cache = _get_cache_wrapped

    _orig_key = cc.get_cache_key

    def _key_wrapped(module, devices, options, backend, *a, **kw):
        key = _orig_key(module, devices, options, backend, *a, **kw)
        name = "?"
        try:
            from jax._src.lib.mlir import ir
            name = ir.StringAttr(module.operation.attributes["sym_name"]).value
        except Exception:
            pass
        _log(f"KEY   {name}: {key[:16]}…")
        return key

    cc.get_cache_key = _key_wrapped
    _log("installed (wrapping jax._src.compilation_cache get/put/get_cache_key)")
