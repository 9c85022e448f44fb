"""Tune the fused GEGLU FF kernel (block size / split-gate) on chip, and
re-A/B head-major attention projections now that the raw flash kernel
changed the surroundings. Run alone.
  PYTHONPATH=. python experiments/r2_geglu_tune.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sdbc_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from sdbc_tpu.ops.geglu_ff import _geglu_ff_rows
from sdbc_tpu.models import unet

def bench_loop(make_body, x0, iters):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, make_body, x)
    r = loop(x0); np.asarray(jax.block_until_ready(r).ravel()[0])
    t0 = time.perf_counter()
    r = loop(x0); np.asarray(jax.block_until_ready(r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3

dt = jnp.bfloat16
print("== geglu kernel variants ==", flush=True)
SKIP_GEGLU = os.environ.get("SKIP_GEGLU")
for (rows, c) in ([] if SKIP_GEGLU else [(32768, 320), (8192, 640)]):
    ks = jax.random.split(jax.random.key(c), 3)
    y0 = jax.random.normal(ks[0], (rows, c), dt)
    g = jnp.ones((c,), jnp.float32); be = jnp.zeros((c,), jnp.float32)
    w1 = jax.random.normal(ks[1], (c, 8 * c), dt) * 0.02
    b1 = jnp.zeros((8 * c,), dt)
    w2 = jax.random.normal(ks[2], (4 * c, c), dt) * 0.02
    b2 = jnp.zeros((c,), dt)
    cfgs = [(0, False), (0, True), (1024, True), (768, True)] if c == 320 \
        else [(0, False), (0, True)]
    for (blk, sp) in cfgs:
        def body(i, x, _b=blk, _s=sp):
            o = _geglu_ff_rows(x, g, be, w1, b1, w2, b2, 1e-5,
                               block=_b, split=_s)
            return (o * 0.001 + y0).astype(dt)
        t = bench_loop(body, y0, 100)
        print(f"  ({rows},{c}) block={blk or 'auto'} split={sp}: {t:.3f} ms",
              flush=True)

print("== transformer layer 64^2, attn_impl=inference ==", flush=True)
dim, heads, hw, b = 320, 8, 64, 8
params = jax.tree.map(lambda x: x.astype(dt),
                      unet._init_transformer(jax.random.key(0), dim, 768, heads))
ctx = jnp.ones((b, 77, 768), dt) * 0.02
for mha in ("legacy", "headmajor", "fused"):
    os.environ["SDBC_MHA"] = mha
    x0 = jnp.ones((b, hw, hw, dim), dt) * 0.1
    def body(i, x):
        y = unet._transformer(params, x, ctx, heads, 32, attn_impl="inference")
        return x + 0.001 * y
    t = bench_loop(body, x0, 40)
    print(f"  mha={mha}: {t:.3f} ms", flush=True)
os.environ.pop("SDBC_MHA", None)
