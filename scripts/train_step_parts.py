"""Decompose the full-size train step: host batch + VAE/CLIP encode vs the
sharded UNet train step itself."""
import sys; sys.path.insert(0, "/root/repo")
import time, logging
logging.basicConfig(level=logging.WARNING)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from videomv_tpu.config import load_config
from videomv_tpu.training.engine import T2VTrainer
from videomv_tpu.data.datasets import batch_iterator
from videomv_tpu.parallel import shard_batch

cfg = load_config("configs/t2v_train.yaml")
cfg.save_ckp_interval = 0
cfg.optimizer = "adafactor"
trainer = T2VTrainer(cfg).init()
batches = batch_iterator(trainer.make_dataset(), 2)
print("init done", flush=True)

rng = jax.random.PRNGKey(1)

# warm everything
hb = next(batches)
feats = trainer.encode_batch(hb)
feats = shard_batch(trainer.mesh, feats)
trainer.state, loss = trainer.train_step(trainer.state, feats, rng)
jax.block_until_ready(loss)

t0 = time.time()
for _ in range(5):
    hb = next(batches)
best_host = (time.time() - t0) / 5

t0 = time.time()
for _ in range(5):
    feats = trainer.encode_batch(hb)
    jax.block_until_ready(feats)
best_enc = (time.time() - t0) / 5

feats = shard_batch(trainer.mesh, feats)
t0 = time.time()
for _ in range(5):
    trainer.state, loss = trainer.train_step(trainer.state, feats, rng)
    _ = float(loss)
best_step = (time.time() - t0) / 5

print(f"host batch: {best_host*1000:.0f} ms; encode: {best_enc*1000:.0f} ms; "
      f"unet step: {best_step*1000:.0f} ms", flush=True)
