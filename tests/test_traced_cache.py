"""Disk-cached traced programs (utils/traced_cache.py).

Tracing the bench sampler costs ~4.5 min per process on the 1-core host;
cached_trace serializes the trace with jax.export and reloads it in later
processes.  Pin: artifact roundtrip, reload-without-retrace, corrupt-file
fallback, and fingerprint sensitivity to the extra key.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from videomv_tpu.utils import traced_cache
from videomv_tpu.utils.traced_cache import cached_trace, fingerprint


def _fn(w, x):
    return jnp.tanh(w @ x).sum(axis=0)


def test_roundtrip_and_reload(tmp_path):
    w = jnp.ones((8, 8))
    x = jnp.arange(8.0)
    f1 = cached_trace(_fn, (w, x), "toy", cache_dir=str(tmp_path))
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].startswith("toy-")
    expect = np.asarray(_fn(w, x))
    np.testing.assert_allclose(np.asarray(f1(w, x)), expect, rtol=1e-6)

    # second call must RELOAD (no new artifact, no retrace): poison the fn
    def _boom(*a):  # pragma: no cover - must not be traced
        raise AssertionError("retraced despite cached artifact")

    f2 = cached_trace(_boom, (w, x), "toy", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(f2(w, x)), expect, rtol=1e-6)
    assert os.listdir(tmp_path) == files


def test_corrupt_artifact_falls_back_to_fresh_trace(tmp_path):
    w = jnp.ones((4, 4))
    x = jnp.arange(4.0)
    cached_trace(_fn, (w, x), "toy", cache_dir=str(tmp_path))
    (path,) = [tmp_path / n for n in os.listdir(tmp_path)]
    path.write_bytes(b"not an export artifact")
    f = cached_trace(_fn, (w, x), "toy", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(f(w, x)), np.asarray(_fn(w, x)), rtol=1e-6)


def test_fingerprint_moves_with_key_and_backend():
    assert fingerprint("a") != fingerprint("b")
    assert fingerprint("a") == fingerprint("a")


def test_abstract_example_args(tmp_path):
    w = jnp.ones((4, 4))
    spec = jax.ShapeDtypeStruct((4,), jnp.float32)
    f = cached_trace(_fn, (w, spec), "abstract", cache_dir=str(tmp_path))
    x = jnp.arange(4.0)
    np.testing.assert_allclose(np.asarray(f(w, x)), np.asarray(_fn(w, x)), rtol=1e-6)


def test_source_hash_is_cached_once(monkeypatch, tmp_path):
    calls = []
    orig = traced_cache._source_tree_hash
    monkeypatch.setattr(traced_cache, "_tree_hash_cache", None)
    monkeypatch.setattr(
        traced_cache, "_source_tree_hash", lambda: calls.append(1) or orig()
    )
    fingerprint("x")
    fingerprint("y")
    assert len(calls) == 1
