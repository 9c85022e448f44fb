"""TPU perf ablation: where do the milliseconds go in the sampling graph?

Run from repo root: PYTHONPATH=.:/root/.axon_site python experiments/perf_ablate.py
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

from sdbc_tpu.diffusion.pipeline import PipelineConfig
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.utils.dtypes import cast_floating


def timeit(fn, *args, reps=3):
    np.asarray(jax.block_until_ready(fn(*args))).ravel()[:1]  # compile+sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.block_until_ready(out)).ravel()[:1]
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    cfg = PipelineConfig.sd15()
    dt = jnp.bfloat16

    @jax.jit
    def build(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return cast_floating({
            "unet": unet.init(k1, cfg.unet),
            "vae": vae.init(k2, cfg.vae),
            "text_encoder": clip.init(k3, cfg.clip),
        }, dt)

    params = build(jax.random.key(0))
    print("params ready", flush=True)

    t16 = jnp.zeros((16,), jnp.int32)
    for b in (8, 16):
        lat = jnp.zeros((b, 64, 64, 4), dt)
        ctx = jnp.zeros((b, 77, 768), dt)
        for impl in ("auto", "xla"):
            os.environ["SDBC_ATTN_IMPL"] = impl
            fn = jax.jit(functools.partial(unet.apply, cfg=cfg.unet))
            try:
                dtime = timeit(fn, params["unet"], lat, t16[:b], ctx)
                print(f"unet fwd b={b} attn={impl}: {dtime*1000:.1f} ms "
                      f"({b/dtime:.1f} fwd/s; "
                      f"{0.68*b/dtime/197*100:.1f}% MFU est)", flush=True)
            except Exception as e:
                print(f"unet fwd b={b} attn={impl}: FAILED {e}", flush=True)
        os.environ.pop("SDBC_ATTN_IMPL", None)

    dec = jax.jit(functools.partial(vae.decode, cfg=cfg.vae))
    z = jnp.zeros((4, 64, 64, 4), dt)
    print(f"vae decode b=4: {timeit(dec, params['vae'], z)*1000:.1f} ms",
          flush=True)

    enc = jax.jit(functools.partial(clip.apply, cfg=cfg.clip,
                                    compute_dtype=dt))
    ids = jnp.zeros((8, 77), jnp.int32)
    print(f"clip encode b=8: {timeit(enc, params['text_encoder'], ids)*1000:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
