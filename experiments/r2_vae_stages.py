"""Round-2: where does VAE decode time actually go? (stage-truncated decodes)

Isolated 3x3 convs at the tail shapes run at 147 TF/s (r2_vae_conv), so the
~0.4 s decode cost lives in the FULL graph's layout/fusion choices, not the
conv math.  Time progressively-truncated decoders; stage cost = difference.
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

from sdbc_tpu.models import vae
from sdbc_tpu.ops import nn
from sdbc_tpu.utils.dtypes import cast_floating


def sync(x):
    return np.asarray(jax.block_until_ready(x)).ravel()[:1]


def sync_retry(fn, n, attempts=6):
    for a in range(attempts):
        try:
            return sync(fn(n))
        except Exception as e:
            print(f"compile attempt {a}: {type(e).__name__} "
                  f"{str(e)[:140]}", flush=True)
            time.sleep(15)
    raise RuntimeError("remote compile kept failing")


def slope(fn, n1=2, n2=12, reps=3):
    sync_retry(fn, n1)
    t1 = min(
        (lambda t0: (sync(fn(n1)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps))
    t2 = min(
        (lambda t0: (sync(fn(n2)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps))
    return (t2 - t1) / (n2 - n1), t1


def decode_stages(params, z, cfg, n_up: int, tail: bool):
    """decode truncated after n_up up-blocks (tail = norm_out+conv_out)."""
    g = cfg.norm_groups
    dec = params["decoder"]
    h = nn.conv2d(params["post_quant_conv"], z)
    h = nn.conv2d(dec["conv_in"], h)
    h = vae._resnet(dec["mid"]["resnet1"], h, g)
    h = vae._attn(dec["mid"]["attn"], h, g)
    h = vae._resnet(dec["mid"]["resnet2"], h, g)
    for block in dec["up"][:n_up]:
        for r in block["resnets"]:
            h = vae._resnet(r, h, g)
        if "upsample" in block:
            h = nn.upsample_nearest_2x(h)
            h = nn.conv2d(block["upsample"], h)
    if tail:
        h = nn.group_norm(dec["norm_out"], h, g, act="silu")
        h = nn.conv2d(dec["conv_out"], h)
    return h


def main():
    cfg = vae.VAEConfig.sd15()
    dt = jnp.bfloat16

    @jax.jit
    def build(key):
        return cast_floating(vae.init(key, cfg), dt)

    params = build(jax.random.key(0))
    print("params ready", flush=True)

    stages = [("mid only", 0, False), ("+up0 (64²,512)", 1, False),
              ("+up1 (128²,512)", 2, False), ("+up2 (256²,256)", 3, False),
              ("+up3 (512²,128)", 4, False), ("full (+norm/conv_out)", 4, True)]
    prev = 0.0
    for name, n_up, tail in stages:
        @jax.jit
        def loop(k, _n=n_up, _t=tail):
            z0 = jnp.ones((4, 64, 64, 4), dt) * 0.1

            def body(i, z):
                img = decode_stages(params, z, cfg, _n, _t)
                s = jnp.mean(img.astype(jnp.float32))
                return z + 0.0001 * s.astype(dt)

            return jax.lax.fori_loop(0, k, body, z0)

        per, base = slope(loop, 2, 12)
        print(f"{name}: cumulative {per*1000:.1f} ms  "
              f"(stage +{(per-prev)*1000:.1f} ms)", flush=True)
        prev = per


if __name__ == "__main__":
    main()
