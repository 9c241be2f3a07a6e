"""Steady-state full-size T2V train-step throughput on TPU (bs=2, f=24,
remat + adafactor). First train() call absorbs compiles; the timed second
call gives steps/s including host batch + VAE/CLIP encode."""
import sys; sys.path.insert(0, "/root/repo")
import time, logging
logging.basicConfig(level=logging.WARNING)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from videomv_tpu.config import load_config
from videomv_tpu.training.engine import T2VTrainer

cfg = load_config("configs/t2v_train.yaml")
cfg.save_ckp_interval = 0
cfg.log_interval = 1000
cfg.viz_interval = 0
cfg.optimizer = "adafactor"
trainer = T2VTrainer(cfg).init()
print("init done", flush=True)

t0 = time.time()
trainer.train(num_steps=2, batch_size=2)
print(f"warmup(2) {time.time()-t0:.0f}s", flush=True)

N = 10
t0 = time.time()
loss = trainer.train(num_steps=N, batch_size=2)
dt = time.time() - t0
print(f"{N} steps in {dt:.1f}s -> {dt/N*1000:.0f} ms/step, "
      f"{N/dt:.2f} steps/s, {2*N/dt:.2f} samples/s/chip, loss {loss:.4f}",
      flush=True)
