"""Tune flash_bwd block sizes at the training 64^2 shape (bh=16,4096,40)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sdbc_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from sdbc_tpu.ops.flash_attention import _flash_fwd
from sdbc_tpu.ops.flash_attention_bwd import flash_bwd

b, h, s, d = 2, 8, 4096, 40
sc = d ** -0.5
q = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(3), (b, h, s, d), jnp.bfloat16)
do = jax.random.normal(jax.random.key(4), (b, h, s, d), jnp.bfloat16)
o, lse = _flash_fwd(q, k, v, sc)

ref = None
for (bq, bkv) in [(256, 512), (512, 512), (512, 1024), (1024, 1024)]:
    @jax.jit
    def loop(q, k, v, o, do, lse, _bq=bq, _bkv=bkv):
        def body(i, c):
            dq, dk, dv = flash_bwd(c, k, v, o, do, lse, sc,
                                   block_q=_bq, block_kv=_bkv)
            return (dq * 0.0 + q).astype(q.dtype)
        return jax.lax.fori_loop(0, 40, body, q)[0, 0, 0, 0]
    r = loop(q, k, v, o, do, lse); np.asarray(jax.block_until_ready(r))
    t0 = time.perf_counter(); np.asarray(loop(q, k, v, o, do, lse))
    t = (time.perf_counter() - t0) / 40 * 1e3
    print(f"bq={bq} bkv={bkv}: {t:.2f} ms", flush=True)
