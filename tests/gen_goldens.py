"""Regenerate tests/goldens/tiny_goldens.npz.

Run ONLY when model/pipeline semantics change on purpose:

    JAX_PLATFORMS=cpu python tests/gen_goldens.py

Inputs exactly mirror the fixtures in conftest.py and the tests in
test_goldens.py (tiny config, init key 0, fixed input keys) so the
regenerated file is reproducible bit-for-bit on CPU.
"""
import os
import sys

# mirror conftest.py exactly — numerics depend on the virtual-device flag
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.diffusion.pipeline import PipelineConfig, SDPipeline
from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.utils.prng import per_sample_fixed_latents


def main() -> None:
    cfg = PipelineConfig.tiny()
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    params = {
        "text_encoder": clip.init(k1, cfg.clip),
        "unet": unet.init(k2, cfg.unet),
        "vae": vae.init(k3, cfg.vae),
    }

    ids = jnp.arange(2 * cfg.clip.ctx).reshape(2, -1) % cfg.clip.vocab_size
    clip_out = clip.apply(params["text_encoder"], ids, cfg.clip)

    lat = jax.random.normal(jax.random.key(10), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(11),
                            (1, cfg.clip.ctx, cfg.unet.cross_attention_dim))
    unet_out = unet.apply(params["unet"], lat, jnp.array([500]), ctx, cfg.unet)

    x = jax.random.normal(jax.random.key(12), (1, 32, 32, 3))
    vae_mean, _ = vae.encode_moments(params["vae"], x, cfg.vae)
    vae_dec = vae.decode(params["vae"], vae_mean, cfg.vae)

    pipe = SDPipeline(params, cfg, CLIPTokenizer.fallback(cfg.clip.vocab_size),
                      compute_dtype=jnp.float32)
    latents = per_sample_fixed_latents(1, (4, 8, 8), seed=42)
    pipe_img = pipe(["golden prompt"], num_inference_steps=4, latents=latents)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goldens", "tiny_goldens.npz")
    np.savez(out,
             clip_out=np.asarray(clip_out),
             unet_out=np.asarray(unet_out),
             vae_mean=np.asarray(vae_mean),
             vae_dec=np.asarray(vae_dec),
             pipe_img=np.asarray(pipe_img))
    print("wrote", out)


if __name__ == "__main__":
    main()
