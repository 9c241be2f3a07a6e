"""Full-size T2V training smoke on TPU: 5 steps, synthetic data, bs=8."""
import sys; sys.path.insert(0, "/root/repo")
import time, logging
logging.basicConfig(level=logging.INFO)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from videomv_tpu.config import load_config
from videomv_tpu.training.engine import T2VTrainer

cfg = load_config("configs/t2v_train.yaml")
cfg.save_ckp_interval = 0
cfg.log_interval = 1
cfg.optimizer = "adafactor"
trainer = T2VTrainer(cfg).init()
t0 = time.time()
loss = trainer.train(num_steps=5, batch_size=2)
print(f"5 steps done in {time.time()-t0:.0f}s, final loss {loss:.4f}", flush=True)
# orbax checkpoint round trip at full size
p = trainer.save("workspace/ckpt_smoke")
trainer.restore(p)
print("orbax save+restore ok:", p, flush=True)
