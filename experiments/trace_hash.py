"""Hash the bench sampling graph's jaxpr — proves compile-cache invariance.

Builds bench.py's exact `sample` call (sd15, ddim-50, batch 4, bf16) over
abstract params (jax.eval_shape — no real arrays, runs on CPU in seconds)
and prints sha256(str(traced.jaxpr)).  An identical hash across commits ⇒
identical HLO ⇒ the persistent TPU compile cache still hits, so a refactor
cannot change the benchmark result (method recorded in
experiments/PERF_NOTES.md, round 3).

Run before and after any edit that touches the sampling path:
    JAX_PLATFORMS=cpu python experiments/trace_hash.py
"""
import hashlib
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from sdbc_tpu.diffusion.pipeline import PipelineConfig, sample
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.utils.dtypes import cast_floating


def main():
    cfg = PipelineConfig.sd15("ddim")
    batch, hw, steps = 4, 512, 50

    def build(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return cast_floating({
            "text_encoder": clip.init(k1, cfg.clip),
            "unet": unet.init(k2, cfg.unet),
            "vae": vae.init(k3, cfg.vae),
        }, jnp.bfloat16)

    params = jax.eval_shape(build, jax.random.key(0))
    f = cfg.vae_scale
    args = (
        params,
        jax.ShapeDtypeStruct((batch, cfg.clip.ctx), jnp.int32),
        jax.ShapeDtypeStruct((batch, cfg.clip.ctx), jnp.int32),
        jax.ShapeDtypeStruct((batch, hw // f, hw // f, cfg.unet.in_channels),
                             jnp.float32),
        jax.ShapeDtypeStruct((), jax.random.key(0).dtype),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    traced = sample.trace(*args, cfg=cfg, num_inference_steps=steps,
                          compute_dtype=jnp.bfloat16)
    s = str(traced.jaxpr)
    print(f"jaxpr chars: {len(s)}")
    print(f"sha256: {hashlib.sha256(s.encode()).hexdigest()}")


if __name__ == "__main__":
    main()
