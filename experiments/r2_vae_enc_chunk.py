"""VAE encode (training path, micro-batch 2 at 512^2): whole vs per-image."""
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
x = jax.random.normal(jax.random.key(1), (2, 512, 512, 3), jnp.bfloat16)

@jax.jit
def whole(x):
    m, lv = vae.encode_moments(params, x, cfg)
    return m

@jax.jit
def chunked(x):
    return jax.lax.map(
        lambda i: vae.encode_moments(params, i[None], cfg)[0][0], x)

def timeit(fn, iters=10):
    r = fn(x); np.asarray(jax.block_until_ready(r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters): r = fn(x)
    np.asarray(jax.block_until_ready(r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3

print("whole  :", round(timeit(whole), 1), "ms")
print("chunked:", round(timeit(chunked), 1), "ms")
