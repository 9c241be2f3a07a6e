"""Phase-level timing of the 512² LGM-refine train step on TPU: host batch
generation, VAE/CLIP encode, gs-supervision wire, shard placement, and the
device step itself (steady-state, block_until_ready)."""
import sys; sys.path.insert(0, "/root/repo")
import time, logging
logging.basicConfig(level=logging.WARNING)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from videomv_tpu.config import load_config
from videomv_tpu.training.engine import T2VTrainer
from videomv_tpu.data.datasets import batch_iterator

print("backend:", jax.default_backend(), flush=True)

cfg = load_config("configs/t2v_train.yaml")
cfg.UNet["use_lgm_refine"] = True
cfg.lgm_opts = "big"
cfg.splat_backend = "auto"
cfg.lambda_lpips = 1.0
cfg.save_ckp_interval = 0
cfg.use_ema = False
cfg.optimizer = "adamw"
cfg.frame_lens = [24]
cfg.batch_sizes = {"24": 1}

t0 = time.time()
trainer = T2VTrainer(cfg).init()
print(f"init {time.time()-t0:.0f}s", flush=True)

dataset = trainer.make_dataset()
batches = batch_iterator(dataset, 1)
rng = jax.random.PRNGKey(1)

for i in range(4):
    t0 = time.time()
    host_batch = next(batches)
    t_host = time.time() - t0

    t0 = time.time()
    feats = trainer.encode_batch(host_batch)
    jax.block_until_ready(feats["latents"])
    t_enc = time.time() - t0

    t0 = time.time()
    feats.update(trainer._gs_features(host_batch))
    jax.block_until_ready(feats["images_gt"])
    t_gs = time.time() - t0

    t0 = time.time()
    from videomv_tpu.parallel import shard_batch
    feats = shard_batch(trainer.mesh, feats)
    jax.block_until_ready(feats["images_gt"])
    t_shard = time.time() - t0

    t0 = time.time()
    trainer.lgm_state, loss, aux = trainer.refine_step(
        trainer.lgm_state, trainer.frozen, feats, rng
    )
    jax.block_until_ready(loss)
    t_step = time.time() - t0

    print(f"iter {i}: host {t_host:.2f}s  encode {t_enc:.2f}s  gs {t_gs:.2f}s  "
          f"shard {t_shard:.2f}s  device_step {t_step:.2f}s  loss {float(loss):.4f}",
          flush=True)
