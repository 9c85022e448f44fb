"""Round-2: VAE-decoder conv formulations at the hot tail shapes (real chip).

XLA's native conv at 512² emits halo-padded relayout fusions (round-1
profile).  Candidate: express the 3x3 SAME conv as 9 shifted (N*H*W, Cin) @
(Cin, Cout) matmuls accumulated — pure MXU dots, no halo relayout, at the
cost of ~9x HBM reads of x (still ~ms-scale at these sizes).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def sync(x):
    return np.asarray(jax.block_until_ready(x)).ravel()[:1]


def sync_retry(fn, n, attempts=8):
    for a in range(attempts):
        try:
            return sync(fn(n))
        except Exception as e:
            print(f"compile attempt {a}: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
            time.sleep(20)
    raise RuntimeError("remote compile kept failing")


def slope(fn, n1=2, n2=12, reps=2):
    sync_retry(fn, n1)
    t1 = min(
        (lambda t0: (sync(fn(n1)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps))
    t2 = min(
        (lambda t0: (sync(fn(n2)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps))
    return (t2 - t1) / (n2 - n1), t1


def conv_xla(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + b


def conv9(x, w, b):
    """3x3 SAME conv as 9 shifted matmuls (no halo relayouts)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((n, h, wd, cout), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            xs = jax.lax.slice(xp, (0, dr, dc, 0), (n, dr + h, dc + wd, cin))
            acc = acc + jnp.einsum("nhwc,co->nhwo", xs, w[dr, dc],
                                   preferred_element_type=jnp.float32)
    return acc.astype(x.dtype) + b


SHAPES = [  # decoder tail hot shapes (batch 4); kept few: each (shape, impl)
    # is a separate remote compile on a slow service
    (4, 512, 512, 128, 128),   # up3 resnet convs — the dominant tail cost
    (4, 256, 256, 256, 256),   # up2 resnet convs
]


def main():
    dt = jnp.bfloat16
    for (n, h, wd, cin, cout) in SHAPES:
        key = jax.random.key(0)
        w = jax.random.normal(key, (3, 3, cin, cout), dt) * 0.02
        b = jnp.zeros((cout,), dt)
        for name, fn in (("xla", conv_xla), ("conv9", conv9)):
            @jax.jit
            def loop(k, _f=fn, _tag=name):
                x0 = jnp.ones((n, h, wd, cin), dt) * 0.1

                def body(i, x):
                    y = _f(x, w, b)
                    # keep shapes closed: fold cout back to cin cheaply
                    if cout != cin:
                        y = jnp.concatenate([y] * (cin // cout), axis=-1)
                    return x + 0.001 * y

                return jax.lax.fori_loop(0, k, body, x0)

            per, base = slope(loop, 4, 64, reps=3)
            gf = 2 * n * h * wd * cin * cout * 9 / 1e9
            print(f"conv {name} ({n},{h},{wd},{cin}->{cout}): "
                  f"{per*1000:.2f} ms  ({gf/per/1000:.0f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
