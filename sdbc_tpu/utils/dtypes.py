"""Mixed-precision policy for TPU.

The reference trains under fp16 autocast with fp32 checkpoints
(/root/reference/finetune_sd.py:453,512-516).  On TPU the idiomatic equivalent
is bfloat16 compute with float32 parameters/optimizer state: bf16 has fp32's
exponent range so no loss scaling is needed, and the MXU natively consumes
bf16 operands with fp32 accumulation.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """What dtype each class of tensor lives in.

    param_dtype:   master copy of weights (fp32 for training)
    compute_dtype: dtype weights/activations are cast to inside the model
    output_dtype:  dtype of model outputs (losses are always fp32)
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_params(self, tree):
        return cast_floating(tree, self.compute_dtype)

    def cast_output(self, x):
        return jax.tree.map(
            lambda a: a.astype(self.output_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, x)


DEFAULT_POLICY = Policy()
# Pure-fp32 policy for numerics tests and CPU golden runs.
FP32_POLICY = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a pytree to `dtype` (ints untouched)."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(_cast, tree)


def cast_tree(tree, dtype):
    return jax.tree.map(lambda x: x.astype(dtype), tree)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
