"""VAE decode: whole-batch vs per-image lax.map chunking.

The once-bucket profile shows the 512^2 decode dominated by XLA's spatial
tiling of (4,512,512,C) convs with f32 stat buffers and layout flips.
Hypothesis: batch-1 chunks tile less aggressively and spill less.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sdbc_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from sdbc_tpu.models import vae
from sdbc_tpu.utils.dtypes import cast_floating

cfg = vae.VAEConfig.sd15()
params = cast_floating(jax.jit(lambda k: vae.init(k, cfg))(jax.random.key(0)),
                       jnp.bfloat16)
lat = jax.random.normal(jax.random.key(1), (4, 64, 64, 4), jnp.bfloat16)

@jax.jit
def whole(lat):
    return vae.decode(params, lat, cfg)

@jax.jit
def chunked(lat):
    return jax.lax.map(lambda l: vae.decode(params, l[None], cfg)[0], lat)

def timeit(fn, iters=8):
    r = fn(lat); np.asarray(jax.block_until_ready(r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(lat)
    np.asarray(jax.block_until_ready(r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3

print("whole-batch :", round(timeit(whole), 1), "ms")
print("per-image   :", round(timeit(chunked), 1), "ms")
