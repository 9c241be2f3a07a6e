"""Disk-cached traced programs: skip host-side retracing across processes.

Why (round-4 verdict weak #3 / PERF roadmap #7, measured in
measurements/r5/bench_warm_r5.md): on the single-core host, TRACING +
lowering the 50-step CFG DDIM sampler costs ~275 s per fresh process —
dwarfing the staged-executable load (~26 ms) once the persistent compile
cache hits.  The compile cache cannot help: it keys on the lowered module,
which only exists after tracing.

Fix: serialize the traced program itself with ``jax.export`` and reload it
in later processes.  ``export.deserialize`` is a fast MLIR parse; calling
the deserialized artifact re-enters the normal compile path, where the
persistent cache (plus utils/stable_cache.py key pinning) stages the
executable in milliseconds.  Tracing is paid once per program change, not
once per process.

Staleness: the artifact bakes the traced program, so a source edit that
changes the computation MUST invalidate it.  The fingerprint therefore
folds a content hash of the whole ``videomv_tpu`` package source (plus the
caller's extra key material and jax's version), computed in ~10 ms.

Failure policy: any deserialize/version/shape problem falls back to a
fresh trace that overwrites the artifact — worst case is exactly today's
behavior.
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Any, Callable, Sequence

logger = logging.getLogger(__name__)


def _source_tree_hash() -> str:
    """Content hash of the package source + the repo-root entry scripts."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(root)
    h = hashlib.sha256()
    files = []
    for base, _, names in os.walk(root):
        files += [os.path.join(base, n) for n in names if n.endswith(".py")]
    for n in ("bench.py", "__graft_entry__.py"):
        p = os.path.join(repo, n)
        if os.path.exists(p):
            files.append(p)
    for p in sorted(files):
        h.update(p.encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


_tree_hash_cache: str | None = None


def fingerprint(extra: str = "") -> str:
    """Stable-across-processes, source-sensitive program fingerprint."""
    global _tree_hash_cache
    import jax

    if _tree_hash_cache is None:
        _tree_hash_cache = _source_tree_hash()
    raw = "|".join((jax.__version__, jax.default_backend(), _tree_hash_cache, extra))
    return hashlib.sha256(raw.encode()).hexdigest()[:16]


def cached_trace(
    fn: Callable,
    example_args: Sequence[Any],
    name: str,
    cache_dir: str | None = None,
    extra_key: str = "",
) -> Callable:
    """Return a callable for ``fn`` traced at ``example_args``' shapes,
    reusing a serialized trace from ``cache_dir`` when one matches.

    ``fn`` is traced (under ``jax.jit``) at most once per (source tree,
    jax version, backend, extra_key, ``name``) — later processes reload
    the exported artifact and skip straight to compilation, which the
    persistent compile cache then serves as a staged executable.

    The returned callable accepts the same positional arguments (same
    shapes/dtypes) as ``example_args``.
    """
    import jax
    from jax import export

    cache_dir = cache_dir or os.environ.get(
        "VIDEOMV_TRACE_CACHE", "/root/repo/.jax_cache/traced"
    )
    fp = fingerprint(extra_key)
    path = os.path.join(cache_dir, f"{name}-{fp}.jaxexport")

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = export.deserialize(bytearray(f.read()))
            logger.info("traced-cache hit: %s", path)
            return exp.call
        except Exception as e:  # stale/corrupt/incompatible — retrace
            logger.warning("traced-cache reload failed (%r); retracing", e)

    exp = export.export(jax.jit(fn))(*example_args)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(exp.serialize())
        os.replace(tmp, path)
        logger.info("traced-cache write: %s", path)
    except Exception as e:  # disk trouble never blocks the computation
        logger.warning("traced-cache write failed (%r)", e)
    return exp.call
