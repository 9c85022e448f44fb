"""Isolate the softmax scheme: v1 layout, running-max vs fixed-cap+ones-lane.

Run: PYTHONPATH=. python experiments/r2_flash_fixedmax.py
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from sdbc_tpu.ops.flash_attention import _flash_fwd  # v1

_CAP = 60.0


def _fixed_kernel(q_ref, k_ref, v_ref, o_ref, *, block_kv: int, kv_pad: int,
                  d: int, unroll: bool):
    q = q_ref[0]
    bq, dp = q.shape
    num_kv = kv_pad // block_kv

    def body(j, acc):
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(jnp.minimum(s, _CAP))
        return acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jnp.zeros((bq, dp), jnp.float32)
    if unroll:
        for j in range(num_kv):
            acc = body(j, acc)
    else:
        acc = jax.lax.fori_loop(0, num_kv, body, acc)
    l = acc[:, d:d + 1]
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv", "unroll"))
def flash_fixed(q, k, v, scale: float, block_q: int = 512, block_kv: int = 1024,
                unroll: bool = True):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    d_pad = (d + 1 + 127) // 128 * 128
    sq_pad = (sq + block_q - 1) // block_q * block_q
    kv_pad = (sk + block_kv - 1) // block_kv * block_kv
    log2e = 1.4426950408889634
    qp = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
    qp = jnp.pad(qp, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad - sk), (0, d_pad - d)))
    vp = vp.at[:, :, :sk, d].set(1.0)  # ones lane -> denominator via MXU
    qp = qp.reshape(b * h, sq_pad, d_pad)
    kp = kp.reshape(b * h, kv_pad, d_pad)
    vp = vp.reshape(b * h, kv_pad, d_pad)
    grid = (b * h, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_fixed_kernel, block_kv=block_kv, kv_pad=kv_pad,
                          d=d, unroll=unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]


def sync(x):
    return np.asarray(jax.block_until_ready(x)).ravel()[:1]


def slope(fn, n1=10, n2=210, reps=4):
    sync(fn(n1))
    t1 = min((lambda t0: (sync(fn(n1)), time.perf_counter() - t0)[1])(time.perf_counter())
             for _ in range(reps))
    t2 = min((lambda t0: (sync(fn(n2)), time.perf_counter() - t0)[1])(time.perf_counter())
             for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def layer_main():
    """Layer-level (projections + glue) comparison across kernels."""
    from sdbc_tpu.ops import nn
    dt = jnp.bfloat16
    heads = 8
    for b, s, c in [(8, 4096, 320), (8, 1024, 640), (8, 256, 1280)]:
        hd = c // heads
        ks = jax.random.split(jax.random.key(s + c), 5)
        p = {n: nn.init_linear(ks[i], c, c, use_bias=(n == "o"))
             for i, n in enumerate(("q", "k", "v", "o"))}
        p = jax.tree.map(lambda a: a.astype(dt), p)
        x0 = (jax.random.normal(ks[4], (b, s, c), jnp.float32) * 0.5).astype(dt)
        scale = float(hd) ** -0.5

        def layer(x, kern):
            def split(t):
                return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
            q, k, v = split(nn.linear(p["q"], x)), split(nn.linear(p["k"], x)), split(nn.linear(p["v"], x))
            a = kern(q, k, v).transpose(0, 2, 1, 3).reshape(b, s, c)
            return nn.linear(p["o"], a)

        for name, kern in (
            ("v1", lambda q, k, v: _flash_fwd(q, k, v, scale)[0]),
            ("fixed", lambda q, k, v: flash_fixed(q, k, v, scale)),
            ("fixed-bkv2048", lambda q, k, v: flash_fixed(q, k, v, scale, block_kv=2048)),
            ("fixed-bq1024", lambda q, k, v: flash_fixed(q, k, v, scale, block_q=1024)),
        ):
            @jax.jit
            def loop(n, kern=kern):
                def body(i, x):
                    return x + (0.001 * layer(x, kern)).astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x0)
            try:
                ms = slope(loop) * 1000
                fl = 4 * b * heads * s * s * hd + 8 * b * s * c * c
                print(f"LAYER (b={b},s={s},c={c}) {name}: {ms:.2f} ms "
                      f"({fl/ms/1e9:.1f} TF/s useful)", flush=True)
            except Exception as e:
                print(f"LAYER (b={b},s={s},c={c}) {name}: FAILED {str(e)[:120]}", flush=True)


def main():
    dt = jnp.bfloat16
    for (b, h, s, d) in [(8, 8, 4096, 40), (8, 8, 1024, 80)]:
        x0 = (jax.random.normal(jax.random.key(s), (b, h, s, d), jnp.float32) * 0.5
              ).astype(dt)
        scale = float(d) ** -0.5

        variants = {
            "v1-runmax": lambda x: _flash_fwd(x, x, x, scale)[0],
            "fixed-unroll": lambda x: flash_fixed(x, x, x, scale, unroll=True),
            "fixed-fori": lambda x: flash_fixed(x, x, x, scale, unroll=False),
        }
        # correctness spot-check
        ref = variants["v1-runmax"](x0)
        for name in ("fixed-unroll",):
            err = float(jnp.max(jnp.abs(variants[name](x0).astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"({b},{h},{s},{d}) {name} vs v1 max_err {err:.2e}", flush=True)

        for name, fn in variants.items():
            @jax.jit
            def loop(n, fn=fn):
                def body(i, x):
                    y = fn(x)
                    return x + (0.001 * y).astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x0)
            try:
                ms = slope(loop) * 1000
                fl = 4 * b * h * s * s * d
                print(f"({b},{h},{s},{d}) {name}: {ms:.2f} ms "
                      f"({fl/ms/1e9:.1f} TF/s useful)", flush=True)
            except Exception as e:
                print(f"({b},{h},{s},{d}) {name}: FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    import sys as _s
    layer_main() if "--layer" in _s.argv else main()
