"""Terminal-rotation-stable compile-cache keys (utils/stable_cache.py).

The axon tunnel folds its terminal's build string (``Built on <date>
cl/<n>``) into every compile-cache key via jax's ``_hash_platform`` slot;
a terminal rotation between a warm-up run and the driver's benchmark then
cold-compiles everything (round-4 verdict weak #3).  These tests pin the
install() wrap with fake axon device/backend objects: keys must be
invariant to the volatile build line, but MUST still move when the
executable wire-format versions, the libtpu override env, or the program
change.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomv_tpu.utils.stable_cache import _stable_pv, install

PV_A = (
    "PJRT C API\n"
    "axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49\n"
    "TFRT TPU v5 lite\n"
    "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709"
)
# same terminal format, rotated build
PV_B = PV_A.replace(
    "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709",
    "Built on Dec 03 2025 09:01:07 (1764752467) cl/999000111",
)
# executable wire format bumped — staged exes would be rejected
PV_C = PV_A.replace("compat c49", "compat c50")


class _FakeClient:
    def __init__(self, pv):
        self.platform_version = pv


class _FakeDevice:
    def __init__(self, pv):
        self.client = _FakeClient(pv)
        self.device_kind = "TPU v5 lite"


class _FakeBackend:
    platform = "tpu"

    def __init__(self, pv):
        # the backend-level string has no PJRT C API prefix
        # (axon/register/ifrt.py:465-471: platform_version_for_jax())
        self.platform_version = pv.removeprefix("PJRT C API\n")


@pytest.fixture(scope="module")
def key_fn():
    assert install(verbose=False)
    from jax._src import cache_key as ck
    from jax._src import compiler

    module = jax.jit(lambda x: x * 2 + 1).lower(jnp.ones(8)).compiler_ir()
    module2 = jax.jit(lambda x: x * 3 - 1).lower(jnp.ones(8)).compiler_ir()
    opts = compiler.get_compile_options(num_replicas=1, num_partitions=1)

    def key(pv, mod=module):
        devs = np.asarray([_FakeDevice(pv)], dtype=object)
        return ck.get(mod, devs, opts, _FakeBackend(pv))

    key.module2 = module2
    return key


def test_stable_pv_strips_only_the_build_line():
    s = _stable_pv(PV_A)
    assert "Built on" not in s
    assert "SerializedExecutable v9; compile-cache v14; compat c49" in s
    assert "TFRT TPU v5 lite" in s
    assert _stable_pv(PV_A) == _stable_pv(PV_B)
    assert _stable_pv(PV_A) != _stable_pv(PV_C)


def test_key_invariant_to_terminal_rotation(key_fn):
    assert key_fn(PV_A) == key_fn(PV_B)


def test_key_moves_with_wire_format_and_program(key_fn):
    assert key_fn(PV_A) != key_fn(PV_C)
    assert key_fn(PV_A) != key_fn(PV_A, mod=key_fn.module2)


def test_key_moves_with_libtpu_overrides(key_fn, monkeypatch):
    base = key_fn(PV_A)
    monkeypatch.setenv("AXON_LIBTPU_OVERRIDES", "megacore_dense=true")
    assert key_fn(PV_A) != base


def test_non_axon_backends_fall_through(key_fn):
    # a real CPU-backend key computes fine through the original folds and
    # is deterministic — the wrap must not perturb non-axon paths
    from jax._src import cache_key as ck
    from jax._src import compiler

    module = jax.jit(lambda x: x + 1).lower(jnp.ones(4)).compiler_ir()
    opts = compiler.get_compile_options(num_replicas=1, num_partitions=1)
    backend = jax.devices()[0].client
    devs = np.asarray(jax.devices()[:1], dtype=object)
    k1 = ck.get(module, devs, opts, backend)
    k2 = ck.get(module, devs, opts, backend)
    assert k1 == k2 and isinstance(k1, str)


def test_install_idempotent():
    assert install(verbose=False)
    from jax._src import cache_key as ck

    f1 = ck._hash_platform
    assert install(verbose=False)
    assert ck._hash_platform is f1
