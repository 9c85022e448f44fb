"""Hash the sampling jaxpr for EVERY scheduler variant (tiny config).

Companion to trace_hash.py (which hashes the sd15 bench graph): traces the
tiny-config `sample` call for each scheduler x {karras, DeepCache}
combination via jax.eval_shape-style tracing (no arrays, seconds on CPU)
and prints one sha256 per variant as JSON.  Identical output before/after
a sampling-path refactor proves every compiled loop is byte-identical —
the gate for the round-4 loop-body deduplication (VERDICT r3 weak #3).

    JAX_PLATFORMS=cpu python experiments/trace_hash_all.py > /tmp/before.json
    ... refactor ...
    JAX_PLATFORMS=cpu python experiments/trace_hash_all.py > /tmp/after.json
    diff /tmp/{before,after}.json
"""
import hashlib
import json
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

VARIANTS = [
    # (label, scheduler, kwargs)
    ("ddim", "ddim", {}),
    ("ddim-cache2", "ddim", {"cache_interval": 2}),
    ("ddim-cache3-tail1", "ddim", {"cache_interval": 3, "cache_tail": 1}),
    ("ddpm", "ddpm", {}),
    ("pndm", "pndm", {}),
    ("lms", "lms", {}),
    ("lms-karras", "lms", {"use_karras_sigmas": True}),
    ("unipc", "unipc", {}),
    ("lcm", "lcm", {}),
    ("euler_a", "euler_a", {}),
    ("euler_a-karras", "euler_a", {"use_karras_sigmas": True}),
    ("dpm", "dpm", {}),
    ("dpm-cache2", "dpm", {"cache_interval": 2}),
    ("dpm-karras", "dpm", {"use_karras_sigmas": True}),
    ("dpm-karras-cache2", "dpm", {"use_karras_sigmas": True,
                                  "cache_interval": 2}),
    ("dpm_sde", "dpm_sde", {}),
    ("dpm_sde-karras", "dpm_sde", {"use_karras_sigmas": True}),
    # img2img t_start variants exercise the noise_to prologue + shifted loop
    ("ddim-img2img", "ddim", {"t_start": 2, "_init_latents": True}),
    ("dpm-img2img", "dpm", {"t_start": 2, "_init_latents": True}),
    ("ddim-cache2-img2img", "ddim", {"t_start": 2, "cache_interval": 2,
                                     "_init_latents": True}),
    # guidance interval (cond-only cond branch)
    ("ddim-cfginterval", "ddim", {"cfg_interval": (0.1, 0.7)}),
]


def main():
    batch, steps = 2, 6
    out = {}
    for label, sched, kw in VARIANTS:
        kw = dict(kw)
        cfg = PipelineConfig.tiny(sched)

        def build(key):
            k1, k2, k3 = jax.random.split(key, 3)
            return {
                "text_encoder": clip.init(k1, cfg.clip),
                "unet": unet.init(k2, cfg.unet),
                "vae": vae.init(k3, cfg.vae),
            }

        params = jax.eval_shape(build, jax.random.key(0))
        f = cfg.vae_scale
        hw = 8 * f
        lat_sh = jax.ShapeDtypeStruct(
            (batch, hw // f, hw // f, cfg.unet.in_channels), jnp.float32)
        if kw.pop("_init_latents", False):
            kw["init_latents"] = lat_sh
        args = (
            params,
            jax.ShapeDtypeStruct((batch, cfg.clip.ctx), jnp.int32),
            jax.ShapeDtypeStruct((batch, cfg.clip.ctx), jnp.int32),
            lat_sh,
            jax.ShapeDtypeStruct((), jax.random.key(0).dtype),
            jax.ShapeDtypeStruct((), jnp.float32),
        )
        traced = sample.trace(*args, cfg=cfg, num_inference_steps=steps,
                              compute_dtype=jnp.float32, **kw)
        out[label] = hashlib.sha256(
            str(traced.jaxpr).encode()).hexdigest()[:16]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
