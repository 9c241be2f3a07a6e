import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import __graft_entry__ as g
fn, args = g.entry()
t0 = time.time()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print(f"entry() compile+run ok in {time.time()-t0:.0f}s, out {out.shape} {out.dtype}", flush=True)
