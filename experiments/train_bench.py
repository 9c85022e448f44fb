"""Training throughput on the real chip: the reference's main fine-tune modes.

  config A: text-encoder-only (reference --train_text_encoder default)
  config B: UNet fine-tune with gradient checkpointing (+8-bit Adam)
Run: python experiments/train_bench.py [A|B|C] [cached] [noremat|selective]

With the optional second arg "cached", the step consumes precomputed VAE
posterior moments (--cache_latents mode, train/latent_cache.py) instead of
pixels — measures the uplift from skipping the in-step VAE encode.
Optional third arg overrides the UNet gradient-checkpointing strategy for
modes B/C: "noremat" disables it entirely, "selective" keeps flash
attention outside the checkpoint regions (models/unet.py remat_mode).
An extra "lora" arg anywhere switches the mode's components to LoRA
adapters (rank 8, train/lora.py) instead of full fine-tuning.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from sdbc_tpu.diffusion.pipeline import PipelineConfig
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.train.trainer import TrainConfig, init_train_state, make_train_step


def main():
    mode = (sys.argv[1] if len(sys.argv) > 1 else "A").upper()
    cfg = PipelineConfig.sd15()

    @jax.jit
    def build(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"text_encoder": clip.init(k1, cfg.clip),
                "unet": unet.init(k2, cfg.unet),
                "vae": vae.init(k3, cfg.vae)}

    params = build(jax.random.key(0))
    print("params ready", flush=True)

    if mode == "A":
        tcfg = TrainConfig(train_text_encoder=True, train_unet=False,
                           grad_accum=4, num_examples=1000)
        micro = 4
    elif mode == "B":
        tcfg = TrainConfig(train_text_encoder=False, train_unet=True,
                           grad_ckpt=True, use_8bit_adam=True,
                           grad_accum=4, num_examples=1000)
        micro = 2
    else:  # C: joint fine-tune (BASELINE.json config 5)
        tcfg = TrainConfig(train_text_encoder=True, train_unet=True,
                           grad_ckpt=True, use_8bit_adam=True,
                           grad_accum=4, num_examples=1000)
        micro = 2

    extra = [a.lower() for a in sys.argv[2:]]
    cached = "cached" in extra
    remat = next((a for a in extra if a in ("noremat", "selective")), "")
    lora = "lora" in extra
    for a in extra:  # "microN" overrides the mode's per-step micro batch
        if a.startswith("micro") and a[5:].isdigit():
            micro = int(a[5:])
    if remat == "noremat":
        tcfg = TrainConfig(**{**tcfg.__dict__, "grad_ckpt": False})
    elif remat == "selective":
        tcfg = TrainConfig(**{**tcfg.__dict__, "remat_mode": "selective"})
    if lora:
        # the int8 update kernel's blocking is pointless on tiny adapters
        tcfg = TrainConfig(**{**tcfg.__dict__, "lora_rank": 8,
                              "lora_alpha": 16.0, "use_8bit_adam": False})
    state = init_train_state(params, tcfg, compute_dtype=jnp.bfloat16,
                             key=jax.random.key(2))
    del params
    step = make_train_step(cfg, tcfg, compute_dtype=jnp.bfloat16, donate=True,
                           cached_latents=cached)
    if cached:
        f = 2 ** (len(cfg.vae.block_out_channels) - 1)
        hw, c = 512 // f, cfg.vae.latent_channels
        batch = {
            "latent_mean": jnp.zeros((tcfg.grad_accum, micro, hw, hw, c),
                                     jnp.float32),
            "latent_logvar": jnp.zeros((tcfg.grad_accum, micro, hw, hw, c),
                                       jnp.float32),
            "input_ids": jnp.ones((tcfg.grad_accum, micro, 77), jnp.int32),
        }
    else:
        batch = {
            "pixel_values": jnp.zeros((tcfg.grad_accum, micro, 512, 512, 3),
                                      jnp.bfloat16),
            "input_ids": jnp.ones((tcfg.grad_accum, micro, 77), jnp.int32),
        }
    key = jax.random.key(1)
    print("compiling train step...", flush=True)
    t0 = time.perf_counter()
    state, m = step(state, batch, key)
    print(f"first step (compile) {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss']):.4f}", flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        state, m = step(state, batch, key)
        _ = float(m["loss"])  # host sync
        times.append(time.perf_counter() - t0)
    dt = min(times)
    imgs = tcfg.grad_accum * micro
    tag = f"{mode}+cached" if cached else mode
    if remat:
        tag += f"+{remat}"
    if lora:
        tag += "+lora8"
    tag += f"+micro{micro}" if any(a.startswith("micro") for a in extra) \
        else ""
    print(f"mode {tag}: {dt:.3f}s/step, {imgs/dt:.2f} train imgs/s/chip "
          f"(micro {micro} x accum {tcfg.grad_accum})", flush=True)


if __name__ == "__main__":
    main()
