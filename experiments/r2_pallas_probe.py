"""Isolate the Mosaic compile failure of ops/pallas_conv.py on the chip."""
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

TR, W, CIN, COUT = 16, 512, 128, 128


def probe(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"{name}: OK {np.asarray(out).ravel()[:1]}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)


def probe1_dma():
    """HBM→VMEM halo DMA + passthrough."""
    def kernel(xp_ref, out_ref, x_vmem, sem):
        n = pl.program_id(0)
        r = pl.program_id(1)
        dma = pltpu.make_async_copy(xp_ref.at[n, pl.ds(r * TR, TR + 2)],
                                    x_vmem, sem)
        dma.start()
        dma.wait()
        out_ref[0] = x_vmem[1:1 + TR, 1:1 + W, :]

    x = jnp.ones((2, W + 2, W + 2, CIN), jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=(2, W // TR),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, TR, W, CIN), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, W, W, CIN), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TR + 2, W + 2, CIN), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )(x)


def probe2_compute():
    """Shifted-slice + reshape + 9 dots on a plain VMEM block (no DMA)."""
    def kernel(x_ref, w_ref, out_ref):
        acc = jnp.zeros((TR * W, COUT), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                xs = x_ref[0, dr:dr + TR, dc:dc + W, :].reshape(TR * W, CIN)
                acc = acc + jax.lax.dot_general(
                    xs, w_ref[dr, dc], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        out_ref[0] = acc.reshape(TR, W, COUT).astype(out_ref.dtype)

    x = jnp.ones((2, TR + 2, W + 2, CIN), jnp.bfloat16)
    w = jnp.ones((3, 3, CIN, COUT), jnp.bfloat16) * 0.01
    return pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((1, TR + 2, W + 2, CIN), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((3, 3, CIN, COUT), lambda i: (0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, TR, W, COUT), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, TR, W, COUT), jnp.bfloat16),
    )(x, w)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("1", "both"):
        probe("probe1_dma", probe1_dma)
    if which in ("2", "both"):
        probe("probe2_compute", probe2_compute)
