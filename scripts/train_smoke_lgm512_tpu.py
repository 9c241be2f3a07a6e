"""Full-size LGM-refine finetune smoke on TPU (VERDICT r2 #7): frozen
1.4B UNet + 'big' LGM (output_size=512), Pallas splat backward, 3 steps —
proves the 512-pixel differentiable render trains within the v5e's 16 GB.
"""
import sys; sys.path.insert(0, "/root/repo")
import time, logging
logging.basicConfig(level=logging.INFO)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from videomv_tpu.config import load_config
from videomv_tpu.training.engine import T2VTrainer

print("backend:", jax.default_backend(), flush=True)

cfg = load_config("configs/t2v_train.yaml")
cfg.UNet["use_lgm_refine"] = True
cfg.lgm_opts = "big"            # output_size=512, splat_size=128
cfg.splat_backend = "auto"      # Pallas fwd+bwd on TPU
cfg.lambda_lpips = 1.0
cfg.save_ckp_interval = 0
cfg.log_interval = 1
cfg.use_ema = False
cfg.optimizer = "adamw"         # only the LGM (~400M) is optimized
cfg.frame_lens = [24]
cfg.batch_sizes = {"24": 1}

t0 = time.time()
trainer = T2VTrainer(cfg).init()
print(f"init {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
loss = trainer.train(num_steps=3, batch_size=1)
dt = time.time() - t0
print(f"3 LGM-refine steps @512^2 done in {dt:.0f}s, final loss {loss:.4f}",
      flush=True)

d = jax.local_devices()[0]
stats = getattr(d, "memory_stats", lambda: None)()
if stats:
    print("peak_bytes_in_use:", stats.get("peak_bytes_in_use", "?"), flush=True)
