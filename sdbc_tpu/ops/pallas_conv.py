"""Pallas 3x3 SAME conv for the VAE decoder's large-spatial tail.

XLA's native conv at 512² spatial emits huge halo-padded relayout fusions
(round-1 profile: ~0.4 s/decode, ~7% of conv speed-of-light).  This kernel
streams row tiles HBM→VMEM with an explicit halo DMA and computes the conv
as 9 shifted (rows·W, Cin) @ (Cin, Cout) MXU dots accumulated in fp32 —
input is read once (+ ~12% halo), output written once.

Layout: NHWC, HWIO weights, stride 1, SAME padding (caller pads H/W by 1).
Channel counts in the decoder tail are 128/256/512 — exact lane multiples.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, w_ref, b_ref, out_ref, x_vmem, sem, *, tr: int, w_out: int):
    n = pl.program_id(0)
    r = pl.program_id(1)
    # halo DMA: rows [r*tr, r*tr + tr + 2) of the padded input
    dma = pltpu.make_async_copy(
        xp_ref.at[n, pl.ds(r * tr, tr + 2)], x_vmem, sem)
    dma.start()
    dma.wait()

    cin = x_vmem.shape[-1]
    cout = out_ref.shape[-1]
    acc = jnp.zeros((tr * w_out, cout), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            xs = x_vmem[dr:dr + tr, dc:dc + w_out, :].reshape(tr * w_out, cin)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dr, dc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    out_ref[0] = acc.reshape(tr, w_out, cout).astype(out_ref.dtype)


def _pick_tr(h: int, w: int, cout: int) -> int:
    """Largest row tile with a ≤4 MB fp32 accumulator that divides H."""
    tr = 16
    while tr > 1 and (tr * w * cout * 4 > 4 * 2 ** 20 or h % tr):
        tr //= 2
    return max(tr, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_same(x, w, b, *, interpret: bool = False):
    """3x3 stride-1 SAME conv.  x (N,H,W,Cin) NHWC, w (3,3,Cin,Cout) HWIO."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    tr = _pick_tr(h, wd, cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    grid = (n, h // tr)
    out = pl.pallas_call(
        functools.partial(_kernel, tr=tr, w_out=wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # padded x, HBM
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tr, wd, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tr + 2, wd + 2, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w.astype(x.dtype), b.reshape(1, -1).astype(x.dtype))
    return out


def eligible(x, w) -> bool:
    """Use the kernel where XLA's conv is pathological: big spatial, lane-
    multiple channels, 3x3."""
    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    return (kh == kw == 3 and h >= 256 and wd >= 256
            and cin % 128 == 0 and cout % 128 == 0 and h % 8 == 0)
