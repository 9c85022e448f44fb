"""Round-2: fused head-major MHA projections vs legacy reshape path (real chip)."""
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
from sdbc_tpu.models import unet
from sdbc_tpu.utils.dtypes import cast_floating


def sync(x):
    return np.asarray(jax.block_until_ready(x)).ravel()[:1]


def sync_retry(fn, n, attempts=8):
    """The axon remote-compile service drops connections under load
    ('broken pipe'); retrying resubmits the compile."""
    for a in range(attempts):
        try:
            return sync(fn(n))
        except Exception as e:  # jax.errors.JaxRuntimeError
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


def main():
    cfg = PipelineConfig.sd15()
    dt = jnp.bfloat16

    @jax.jit
    def build(key):
        return cast_floating({"unet": unet.init(key, cfg.unet)}, dt)

    params = build(jax.random.key(0))
    print("params ready", flush=True)

    b = 8  # CFG batch for the bench's batch-4 protocol
    for mha in ("fused", "legacy"):
        os.environ["SDBC_MHA"] = mha

        @jax.jit
        def unet_loop(n, _tag=mha):
            lat0 = jnp.ones((b, 64, 64, 4), dt) * 0.1
            ctx = jnp.ones((b, 77, 768), dt) * 0.02
            t = jnp.full((b,), 500, jnp.int32)

            def body(i, lat):
                eps = unet.apply(params["unet"], lat, t, ctx, cfg.unet)
                return lat - 0.001 * eps

            return jax.lax.fori_loop(0, n, body, lat0)

        per_step, base = slope(unet_loop)
        print(f"unet step b={b} mha={mha}: {per_step*1000:.1f} ms/step "
              f"({0.34*b/per_step/197*100:.1f}% MFU)", flush=True)


if __name__ == "__main__":
    main()
