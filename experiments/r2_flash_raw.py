"""A/B the raw (unpadded-input) fixed-cap flash kernel vs the padded one.

Kernel-level timing at the UNet's sampling shapes; loop spans long enough to
swamp tunnel RTT (lesson from r2_flash_fixedmax.py). Run alone.
  PYTHONPATH=. python experiments/r2_flash_raw.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sdbc_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from sdbc_tpu.ops.flash_attention import _flash_fixed_fwd, _flash_fixed_fwd_raw

def timeit(fn, q, k, v, iters):
    @jax.jit
    def loop(q, k, v):
        def body(i, c):
            o = fn(c, k, v)
            return o * 0.0 + q  # data dep, keep shapes
        return jax.lax.fori_loop(0, iters, body, q)[0, 0, 0]
    r = loop(q, k, v); r.block_until_ready(); np.asarray(r)
    t0 = time.perf_counter()
    r = loop(q, k, v); np.asarray(r)
    return (time.perf_counter() - t0) / iters * 1e3

for (b, h, s, d) in [(8, 8, 4096, 40), (8, 8, 1024, 80)]:
    q = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(3), (b, h, s, d), jnp.bfloat16)
    sc = d ** -0.5
    it = 60 if s == 4096 else 200
    bq = 1024 if s >= 2048 else 512
    tp = timeit(lambda c, kk, vv: _flash_fixed_fwd(c, kk, vv, sc), q, k, v, it)
    tr = timeit(lambda c, kk, vv: _flash_fixed_fwd_raw(c, kk, vv, sc, bq, 1024), q, k, v, it)
    print(f"({b},{h},{s},{d}): padded {tp:.2f} ms  raw {tr:.2f} ms")
