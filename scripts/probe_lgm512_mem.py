"""Memory breakdown of the 512-render LGM-refine train step (the r3/r4
HBM-OOM): lower + compile the step against the real arg shapes and print
XLA's memory_analysis, then the static residents, WITHOUT executing."""
import sys; sys.path.insert(0, "/root/repo")
import time, logging
logging.basicConfig(level=logging.WARNING)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from videomv_tpu.config import load_config
from videomv_tpu.training.engine import T2VTrainer

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


def nbytes(tree):
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "nbytes"))

print(f"frozen (unet+vae+lpips): {nbytes(trainer.frozen)/2**30:.2f} GiB")
print(f"lgm params: {nbytes(trainer.lgm_state.lgm_params)/2**30:.2f} GiB")
print(f"opt state:  {nbytes(trainer.lgm_state.opt_state)/2**30:.2f} GiB")

# build the device batch exactly like train() does
from videomv_tpu.data.datasets import batch_iterator
from videomv_tpu.parallel import shard_batch

host = next(batch_iterator(trainer.make_dataset(), 1))
feats = trainer.encode_batch(host)
feats.update(trainer._gs_features(host))
feats = shard_batch(trainer.mesh, feats)
print("batch bytes:", f"{nbytes(feats)/2**30:.2f} GiB", flush=True)

rng = jax.random.PRNGKey(0)
t0 = time.time()
lowered = trainer.refine_step.lower(trainer.lgm_state, trainer.frozen, feats, rng)
compiled = lowered.compile()
print(f"compile {time.time()-t0:.0f}s", flush=True)
ma = compiled.memory_analysis()
for k in ("argument_size_in_bytes", "output_size_in_bytes",
          "temp_size_in_bytes", "alias_size_in_bytes",
          "generated_code_size_in_bytes"):
    v = getattr(ma, k, None)
    if v is not None:
        print(f"{k}: {v/2**30:.2f} GiB", flush=True)
