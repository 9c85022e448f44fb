"""Kernel-level A/B: int8-QK fixed-cap flash vs bf16 raw, on chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sdbc_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from sdbc_tpu.ops.flash_attention import _flash_fixed_fwd_raw, _flash_fixed_fwd_int8

def timeit(fn, q, k, v, iters):
    @jax.jit
    def loop(q, k, v):
        def body(i, c):
            o = fn(c, k, v)
            return (o * 0.0 + q).astype(q.dtype)
        return jax.lax.fori_loop(0, iters, body, q)[0, 0, 0, 0]
    r = loop(q, k, v); np.asarray(jax.block_until_ready(r))
    t0 = time.perf_counter(); np.asarray(loop(q, k, v)); 
    return (time.perf_counter() - t0) / iters * 1e3

b, h, s, d = 8, 8, 4096, 40
q = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(3), (b, h, s, d), jnp.bfloat16)
sc = d ** -0.5
print("raw  :", timeit(lambda a,b_,c: _flash_fixed_fwd_raw(a,b_,c,sc,1024,1024), q,k,v, 60))
print("int8 :", timeit(lambda a,b_,c: _flash_fixed_fwd_int8(a,b_,c,sc,1024,1024), q,k,v, 60))
