"""Head-packing A/B, take 2: fixed-n loop timing (robust to tunnel spikes).

r3_head128.py's two-point slope estimator produced negative per-iter times
on a degraded axon tunnel (a single ~0.5 s latency spike at the small-n
point flips the slope sign).  Here every variant runs the SAME loop length
n, several reps, min-of-reps — the constant dispatch/RTT offset inflates
all variants equally (~0.1 s / n per iter) and cancels in the comparison.
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

from sdbc_tpu.models import unet
from sdbc_tpu.ops.flash_attention import flash_attention_fixed

from r3_head128 import pad_heads, mha_legacy, mha_packed

N = 200
REPS = 5


def sync(x):
    return np.asarray(jax.block_until_ready(x)).ravel()[:1]


def time_loop(fn, x0, label):
    @jax.jit
    def loop(n):
        def body(i, x):
            return x + 0.001 * fn(x)

        return jax.lax.fori_loop(0, n, body, x0)

    for a in range(8):  # compile w/ retry (remote compile service drops)
        try:
            sync(loop(N))
            break
        except Exception as e:
            print(f"compile attempt {a}: {type(e).__name__} {str(e)[:100]}",
                  flush=True)
            time.sleep(20)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(loop(N))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / N
    print(f"{label}: {per*1000:.3f} ms/iter  (reps {[round(t,3) for t in ts]})",
          flush=True)
    return per


def run_shape(dim, heads, hw, b, pads):
    dt = jnp.bfloat16
    hd = dim // heads
    p = jax.tree.map(lambda x: x.astype(dt),
                     unet._init_mha(jax.random.key(0), dim, dim, heads))
    x0 = (jax.random.normal(jax.random.key(1), (b, hw * hw, dim)) * 0.3
          ).astype(dt)

    time_loop(functools.partial(mha_legacy, p, heads=heads), x0,
              f"mha {hw}² b={b} legacy(d={hd})")
    for hd_pad in pads:
        pp = pad_heads(p, heads, hd, hd_pad)
        time_loop(functools.partial(mha_packed, pp, heads=heads, hd=hd,
                                    hd_pad=hd_pad), x0,
                  f"mha {hw}² b={b} packed(d={hd_pad})")


def main():
    b = 8
    run_shape(320, 8, 64, b, pads=(64,))
    run_shape(640, 8, 32, b, pads=(128,))
    run_shape(1280, 8, 16, b, pads=(256,))


if __name__ == "__main__":
    main()
