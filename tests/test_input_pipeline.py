"""Train input-pipeline: uint8 wire format + threaded host prefetch.

The host→device video upload dominates the per-step host cost on the
tunneled chip (37.7 MB fp32 at bs=2×24×256²); engine.encode_batch ships
uint8 (9.4 MB) and normalizes on device. Sources are 8-bit images, so the
round-trip must be EXACT for uint8-derived pixels.
"""
import numpy as np
import pytest

from videomv_tpu.config import load_config
from videomv_tpu.data.datasets import batch_iterator, prefetch_host
from videomv_tpu.training.engine import T2VTrainer


def test_prefetch_host_order_and_end():
    items = [{"i": np.asarray(i)} for i in range(7)]
    out = list(prefetch_host(iter(items), depth=2))
    assert [int(b["i"]) for b in out] == list(range(7))


def test_prefetch_host_joins_worker_on_early_close():
    """Abandoning the iterator mid-stream must not leak the worker thread.

    The r5 full-suite crash dump showed a prefetch worker parked forever on
    q.put() after its trainer finished (measurements/r5/
    pytest_full_r5_final_ABORTED.log) — close() must stop AND join it."""
    import threading
    import time

    started = threading.Event()

    def endless():
        while True:
            started.set()
            yield {"i": np.zeros(4)}

    before = set(threading.enumerate())
    it = prefetch_host(endless(), depth=1)
    next(it)
    assert started.wait(timeout=5)
    it.close()  # triggers the generator's finally: stop + drain + join
    deadline = time.time() + 5
    while time.time() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"prefetch worker leaked: {leaked}"


def test_prefetch_host_propagates_errors():
    def gen():
        yield {"i": np.asarray(0)}
        raise RuntimeError("loader died")

    it = prefetch_host(gen())
    assert int(next(it)["i"]) == 0
    with pytest.raises(RuntimeError, match="loader died"):
        next(it)


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = load_config("configs/t2v_train_tiny.yaml", opts=[])
    cfg["use_ema"] = False
    cfg["dp_devices"] = 2  # batch of 2 must divide the data mesh
    return T2VTrainer(cfg).init()


@pytest.mark.slow
def test_uint8_wire_exact_for_8bit_sources(tiny_trainer):
    """u8 → fp32 [-1,1] → u8 wire → device normalize must reproduce the
    fp32 path bit-for-bit (same latents/text embeddings)."""
    tr = tiny_trainer
    f = int(tr.max_frames)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(1, f, 3, 64, 64), dtype=np.uint8)
    video = (u8.astype(np.float32) / 127.5) - 1.0
    batch = {"video": video, "caption": ["a chair"],
             "camera_data": np.zeros((1, f, 16), np.float32)}

    tr.cfg["wire_uint8"] = True
    tr._encode_batch = None
    wired = tr.encode_batch(batch)

    tr.cfg["wire_uint8"] = False
    tr._encode_batch = None
    plain = tr.encode_batch(batch)
    tr.cfg["wire_uint8"] = True
    tr._encode_batch = None

    np.testing.assert_array_equal(np.asarray(wired["latents"]),
                                  np.asarray(plain["latents"]))
    np.testing.assert_array_equal(np.asarray(wired["y_words"]),
                                  np.asarray(plain["y_words"]))


@pytest.mark.slow
def test_train_steps_with_pipeline(tiny_trainer):
    """End-to-end: prefetched uint8 pipeline feeds real train steps."""
    loss = tiny_trainer.train(num_steps=2, batch_size=2)
    assert np.isfinite(loss)
    # the donated state fed back into step 2 must NOT retrace: a raw
    # (mesh-unplaced) state.step scalar used to change the aval sharding
    # annotation between call 1 and call 2, recompiling the whole program
    # (the ~300 s "second tunnel compile" of PERF.md roadmap #7)
    assert tiny_trainer.train_step._cache_size() == 1
