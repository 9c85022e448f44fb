"""A/B: v1 flash (+transpose/pad glue) vs flash2 (B,S,H,D-native) on real TPU.

Measures the full attention sublayer (qkv projections + attention + out
projection) both ways at the UNet's self-attention shapes, slope method.
Run: PYTHONPATH=. python experiments/r2_flash2.py
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from sdbc_tpu.ops import nn
from sdbc_tpu.ops.attention import attention
from experiments.flash_attention2_dead import flash_attention2


def sync(x):
    return np.asarray(jax.block_until_ready(x)).ravel()[:1]


def slope(fn, n1=10, n2=210, reps=4):
    sync(fn(n1))
    t1 = min((lambda t0: (sync(fn(n1)), time.perf_counter() - t0)[1])(time.perf_counter())
             for _ in range(reps))
    t2 = min((lambda t0: (sync(fn(n2)), time.perf_counter() - t0)[1])(time.perf_counter())
             for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def main():
    dt = jnp.bfloat16
    heads = 8
    # UNet self-attention shapes at CFG batch 8 (512² sampling)
    shapes = [(8, 4096, 320), (8, 1024, 640), (8, 256, 1280), (8, 64, 1280)]

    key = jax.random.key(0)
    for b, s, c in shapes:
        hd = c // heads
        ks = jax.random.split(jax.random.key(s + c), 5)
        p = {
            "q": nn.init_linear(ks[0], c, c, use_bias=False),
            "k": nn.init_linear(ks[1], c, c, use_bias=False),
            "v": nn.init_linear(ks[2], c, c, use_bias=False),
            "o": nn.init_linear(ks[3], c, c),
        }
        p = jax.tree.map(lambda a: a.astype(dt), p)
        x0 = (jax.random.normal(ks[4], (b, s, c), jnp.float32) * 0.5).astype(dt)

        def legacy_layer(x):
            def split(t):
                return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
            q = split(nn.linear(p["q"], x))
            k = split(nn.linear(p["k"], x))
            v = split(nn.linear(p["v"], x))
            a = attention(q, k, v, impl="flash").transpose(0, 2, 1, 3).reshape(b, s, c)
            return nn.linear(p["o"], a)

        def flash2_layer(x):
            q = nn.linear(p["q"], x).reshape(b, s, heads, hd)
            k = nn.linear(p["k"], x).reshape(b, s, heads, hd)
            v = nn.linear(p["v"], x).reshape(b, s, heads, hd)
            a = flash_attention2(q, k, v).reshape(b, s, c)
            return nn.linear(p["o"], a)

        def xla_layer(x):
            def split(t):
                return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
            q = split(nn.linear(p["q"], x))
            k = split(nn.linear(p["k"], x))
            v = split(nn.linear(p["v"], x))
            a = attention(q, k, v, impl="xla").transpose(0, 2, 1, 3).reshape(b, s, c)
            return nn.linear(p["o"], a)

        for name, layer in (("legacy-v1", legacy_layer), ("flash2", flash2_layer),
                            ("xla", xla_layer)):
            @jax.jit
            def loop(n, layer=layer):
                def body(i, x):
                    y = layer(x)
                    return x + 0.001 * y
                return jax.lax.fori_loop(0, n, body, x0)

            try:
                ms = slope(loop) * 1000
                # useful attention flops: 4*b*h*s^2*hd + 4 projections
                fl = 4 * b * heads * s * s * hd + 8 * b * s * c * c
                print(f"(b={b}, s={s}, c={c}) {name}: {ms:.2f} ms "
                      f"({fl/ms/1e9:.1f} TF/s useful)", flush=True)
            except Exception as e:
                print(f"(b={b}, s={s}, c={c}) {name}: FAILED {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
