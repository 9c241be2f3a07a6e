"""Engine-level LGM-refine finetune mode: cfg.UNet.use_lgm_refine drives
build_lgm_refine_step through train() (reference train_i2v_enterance.py
LGM-only finetune, :154-165)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow
def test_engine_lgm_refine_mode():
    from videomv_tpu.config import load_config
    from videomv_tpu.training.engine import T2VTrainer

    cfg = load_config("configs/lgm_refine_train_tiny.yaml", opts=[])
    tr = T2VTrainer(cfg).init()

    # refine mode: no standard train state, LGM state + frozen towers exist
    assert tr.use_lgm_refine
    assert tr.state is None
    assert tr.lgm_state is not None
    assert len(tr.frozen) == 3  # unet, vae, lpips

    before = [
        np.asarray(x).copy()
        for x in jax.device_get(jax.tree_util.tree_leaves(tr.lgm_state.lgm_params))
    ]
    # 2 steps: warmup LR is 0 at optax step 0, nonzero from step 1
    loss = tr.train(num_steps=2, batch_size=2)
    assert np.isfinite(loss) and loss > 0
    after = jax.device_get(jax.tree_util.tree_leaves(tr.lgm_state.lgm_params))
    moved = max(np.abs(a - b).max() for a, b in zip(after, before))
    assert moved > 0, "LGM params must update"
    assert int(tr.lgm_state.step) == 2
    # no retrace on the donated-state second call (mesh-placed step scalar;
    # PERF.md roadmap #7 second-compile root cause)
    assert tr.refine_step._cache_size() == 1
