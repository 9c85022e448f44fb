"""Round-2: FID-validate the fast sampling paths (tiny-scale methodology).

Real SD-1.5 weights cannot enter this zero-egress environment, so absolute
FID vs the Goodreads statistics is not computable here.  What IS measurable
and decision-relevant: with a briefly-trained tiny model, how far each fast
path's distribution drifts from the exact 50-step DDIM protocol on the SAME
prompts/latents —
  (a) pixel MAE vs the exact images (same latents), and
  (b) FID between the fast-path set and the exact-DDIM set (the exact set
      plays the role of "real" statistics; Inception is the deterministic
      random-init extractor, giving self-consistent deltas).
Ranking by (b) transfers to real weights as the standard DeepCache/DPM
literature ordering; the absolute numbers do not.

Writes a markdown table for PERF_NOTES.md.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion.pipeline import PipelineConfig, SDPipeline
from sdbc_tpu.eval import fid as fid_mod
from sdbc_tpu.models import clip, inception, unet, vae
from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                    make_train_step, merged_params)
from sdbc_tpu.utils.prng import per_sample_fixed_latents

N_IMAGES = 48
IMG = 64


def train_tiny(cfg, steps=60):
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"text_encoder": clip.init(k1, cfg.clip),
              "unet": unet.init(k2, cfg.unet),
              "vae": vae.init(k3, cfg.vae)}
    tcfg = TrainConfig(train_unet=True, train_text_encoder=True, grad_accum=1,
                       learning_rate=2e-4, num_examples=steps)
    state = init_train_state(params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(cfg, tcfg, compute_dtype=jnp.float32)
    # synthetic structured covers: blocks of constant color + borders
    rng = np.random.default_rng(0)
    imgs = np.zeros((8, IMG, IMG, 3), np.float32)
    for i in range(8):
        imgs[i] += rng.uniform(-0.8, 0.8, (1, 1, 3)).astype(np.float32)
        imgs[i, :4] = 1.0
        imgs[i, -4:] = -1.0
    ids = np.stack([CLIPTokenizer.fallback(cfg.clip.vocab_size).encode(
        f"cover {i}", cfg.clip.ctx) for i in range(8)]).astype(np.int32)
    batch = {"pixel_values": jnp.asarray(imgs)[None],
             "input_ids": jnp.asarray(ids)[None]}
    key = jax.random.key(7)
    for s in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
    print(f"trained tiny model: loss {float(m['loss']):.4f}", flush=True)
    return merged_params(state)


def gen(pipe, protocol, prompts, latents):
    name, steps, kwargs = protocol
    out = []
    for i in range(0, len(prompts), 8):
        out.append(pipe(prompts[i:i + 8], height=IMG, width=IMG,
                        num_inference_steps=steps,
                        latents=latents[i:i + 8], **kwargs))
    return np.concatenate(out, axis=0)


def main():
    cfg = PipelineConfig.tiny("ddim")
    params = train_tiny(cfg)
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    import dataclasses

    prompts = [f"cover {i % 8}" for i in range(N_IMAGES)]
    latents = per_sample_fixed_latents(
        N_IMAGES, (cfg.unet.in_channels, IMG // 8, IMG // 8), seed=42)

    protocols = [
        ("ddim-50 (exact reference protocol)", 50, {}),
        ("dpm-25", 25, {"scheduler": "dpm"}),
        ("ddim-50 + cache k=2 tail=1", 50, {"cache_interval": 2,
                                            "cache_tail": 1}),
        ("ddim-50 + cache k=3 tail=1", 50, {"cache_interval": 3,
                                            "cache_tail": 1}),
        ("dpm-25 + cache k=2 tail=1", 25, {"scheduler": "dpm",
                                           "cache_interval": 2,
                                           "cache_tail": 1}),
        ("dpm-25 + cache k=3 tail=1", 25, {"scheduler": "dpm",
                                           "cache_interval": 3,
                                           "cache_tail": 1}),
    ]

    sets = {}
    for name, steps, kw in protocols:
        sched = kw.pop("scheduler", "ddim")
        pcfg = dataclasses.replace(cfg, scheduler=sched)
        pipe = SDPipeline(params, pcfg, tok, compute_dtype=jnp.float32)
        sets[name] = gen(pipe, (name, steps, kw), prompts, latents)
        print(f"generated {name}", flush=True)

    # full-width (2048-d) random-init extractor: tiny-width features are too
    # weak to separate the sets (first run measured FID ~0 everywhere)
    icfg = inception.InceptionConfig.fid()
    iparams = inception.init(jax.random.key(2015), icfg)

    def stats(imgs):
        feats = np.asarray(inception.features(
            iparams, jnp.asarray(imgs * 255.0), icfg))
        return feats.mean(0), np.cov(feats, rowvar=False)

    exact = sets[protocols[0][0]]
    m0, s0 = stats(exact)
    rows = ["| protocol | pixel MAE vs exact | FID vs exact set |",
            "|---|---|---|"]
    for name, _, _ in protocols:
        imgs = sets[name]
        mae = float(np.abs(imgs - exact).mean())
        m1, s1 = stats(imgs)
        f = fid_mod.calculate_frechet_distance(m0, s0, m1, s1)
        rows.append(f"| {name} | {mae:.4f} | {f:.5f} |")
        print(rows[-1], flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "r2_fid_fast_table.md"), "w") as fh:
        fh.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
