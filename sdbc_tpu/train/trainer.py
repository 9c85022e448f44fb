"""pjit'ed fine-tuning step for SD-1.x on a named mesh.

Covers the reference trainer's semantics (finetune_sd.py:298-586) the TPU way:

  - one jitted step = grad-accum scan over micro-batches (the reference's
    ``accelerator.accumulate`` with default 16 micro-steps, :38,:454-458)
  - VAE encode (stop-gradient, reference ``.detach()`` at :460-462), noise +
    uniform timestep draw (:465-469), DDPM add_noise (:473), CLIP encode
    (:477), UNet eps-prediction (:480-481), fp32 MSE (:483)
  - ``--train_unet`` / ``--train_text_encoder`` trainability split
    (:374-399): trainable params are fp32 masters updated by optax AdamW +
    cosine anneal (T_max=num_examples, eta_min=1e-6, :415-422); frozen
    components are pre-cast to bf16 (the reference casts frozen models to
    fp16, :381-399)
  - NaN guard: non-finite loss skips the update instead of the reference's
    ``breakpoint()`` (:491-493)
  - data parallelism: batch sharded over the mesh's ``data`` axis; XLA emits
    the psum gradient allreduce over ICI (replacing accelerate/NCCL DDP)
  - gradient checkpointing via UNet ``remat`` (reference :388-389)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from sdbc_tpu.diffusion import schedulers as sched_mod
from sdbc_tpu.models import clip as clip_mod
from sdbc_tpu.models import unet as unet_mod
from sdbc_tpu.models import vae as vae_mod
from sdbc_tpu.diffusion.pipeline import (PipelineConfig, _xl_added_cond,
                                         encode_text_xl)
from sdbc_tpu.utils.dtypes import cast_floating


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # reference defaults: finetune_sd.py:25-48
    learning_rate: float = 5e-6
    weight_decay: float = 1e-4
    # Cosine decay horizon in OPTIMIZER steps: the schedule is evaluated once
    # per optimizer update (cli/finetune.py passes steps_per_epoch*epochs).
    # Intentional difference from the reference, which calls scheduler.step()
    # per MICRO-batch with T_max=num_examples (finetune_sd.py:421,576) — its
    # accumulation semantics are muddled (SURVEY.md §7 bug list).
    num_examples: int = 12000
    eta_min: float = 1e-6
    grad_accum: int = 16
    micro_batch: int = 1              # per-device micro batch (lr scaling only)
    train_unet: bool = False
    train_text_encoder: bool = True
    grad_ckpt: bool = False
    # "block" = checkpoint whole ResBlocks/transformers (reference semantics);
    # "selective" = keep flash attention outside the checkpoint regions
    # (models/unet.py::_transformer_selective) — faster, slightly more memory
    remat_mode: str = "block"
    use_8bit_adam: bool = False       # blockwise-int8 moments (reference :407-410)
    max_grad_norm: float = 0.0        # 0 = off (reference has no clipping)
    # The reference's scale_lr branch multiplies lr by
    # grad_accum * batch_size * num_processes but DEFAULTS OFF
    # (utils hyperparam scale_lr=False; conditional at finetune_sd.py:367-371)
    lr_scale_by_dp: bool = False
    # LoRA (train/lora.py): rank > 0 trains low-rank attention deltas
    # instead of full components — train_unet/train_text_encoder then
    # select which components get adapters.  alpha follows the usual
    # ΔW = (alpha/rank)·A·B scaling.  (Beyond the reference, which only
    # supports full fine-tuning, finetune_sd.py:374-399.)
    lora_rank: int = 0
    lora_alpha: float = 8.0
    # Textual inversion (train/textual_inversion.py): a non-empty token
    # trains ONLY ti_vectors new embedding rows appended to the CLIP table
    # (ids registered by data/tokenizer.add_placeholder); every component
    # stays frozen.  Mutually exclusive with lora_rank.
    ti_token: str = ""
    ti_vectors: int = 1
    # Loss shaping (beyond the reference's plain MSE, finetune_sd.py:483):
    # min_snr_gamma > 0 weights each example's loss by
    # min(SNR_t, gamma)/SNR_t (eps objective; /(SNR+1) for v) — Hang et
    # al. 2023, arXiv:2303.09556 — down-weighting the near-noiseless low-t
    # steps that otherwise dominate.  noise_offset > 0 adds a per-example
    # constant shift to the training noise (offset noise), letting the
    # model move overall brightness — covers are often very dark/light.
    min_snr_gamma: float = 0.0
    noise_offset: float = 0.0
    # Prior preservation (DreamBooth, arXiv:2208.12242 — beyond the
    # reference, which only does plain fine-tuning): > 0 expects each
    # micro-batch to carry prior_pixel_values/prior_input_ids (class
    # images under the class prompt, train/prior.py); the combined batch
    # runs ONE UNet call and the loss is
    # mean(instance MSE) + prior_weight · mean(prior MSE) — the weighting
    # that keeps the class manifold from collapsing onto the few instance
    # images.  Incompatible with cached latents (the prior set has no
    # cache).
    prior_weight: float = 0.0
    # EMA of the trainable tree (beyond the reference; standard diffusion
    # practice — diffusers' train scripts keep an EMAModel of the UNet).
    # 0 = off.  >0 maintains a shadow copy updated after every optimizer
    # step with the warmup-ramped decay min(ema_decay, (1+t)/(10+t)), and
    # checkpoints/eval serve the EMA weights (utils/checkpoint.py `ema`).
    ema_decay: float = 0.0
    # ControlNet (models/controlnet.py, arXiv:2302.05543): train ONLY the
    # control branch with the whole base model frozen (the paper's
    # protocol).  The conditioning hint is derived in-graph from the pixel
    # batch per `control_hint` (controlnet.training_hint) — no extra
    # dataset columns.  Requires params["controlnet"] + cfg.controlnet.
    train_controlnet: bool = False
    control_hint: str = "edges"        # "edges" (Sobel) | "image" (identity)
    # SDXL (cfg.clip2 set): train_text_encoder then covers BOTH encoders
    # (the two are one conditioning stack — tuning only CLIP-L would skew
    # the concatenated context against the frozen pooled embedding).  Set
    # by the finetune CLI from cfg.is_sdxl; library callers must keep it
    # consistent with the PipelineConfig they pass to make_train_step.
    dual_text_encoder: bool = False
    # SDXL-refiner (cfg.refiner): params carry only text_encoder_2, and
    # the training micro-conditioning is the 5-id aesthetic tuple.  Set by
    # the finetune CLI from cfg.refiner; implies dual_text_encoder.
    refiner: bool = False
    # NOTE: no `seed` field — all training RNG comes from the explicit
    # `key` argument to the step function (utils/prng.py discipline); a
    # config seed here would look authoritative while doing nothing

    @property
    def lora_scale(self) -> float:
        return self.lora_alpha / self.lora_rank

    def trainable_keys(self):
        if self.train_controlnet:
            # the paper's protocol: every base component stays frozen
            return ("controlnet",)
        keys = []
        if self.train_unet:
            keys.append("unet")
        if self.train_text_encoder:
            if not self.refiner:  # a refiner has no first encoder
                keys.append("text_encoder")
            if self.dual_text_encoder:
                keys.append("text_encoder_2")
        return tuple(keys)


class TrainState(NamedTuple):
    trainable: Any      # fp32 master params being optimised
    frozen: Any         # bf16 frozen params (vae + non-trained components)
    opt_state: Any
    step: jax.Array
    # EMA shadow of `trainable` (None when ema_decay == 0).  Same tree
    # structure as trainable, so TP/FSDP spec walkers shard it by the same
    # path-suffix rules and a None field is an empty pytree everywhere.
    ema: Any = None


def _split_params(params, tcfg: TrainConfig, compute_dtype=jnp.bfloat16,
                  key=None, ti_init_ids=None):
    tkeys = tcfg.trainable_keys()
    if tcfg.refiner and tcfg.ti_token:
        raise ValueError(
            "textual inversion is not wired for the refiner flavor (its "
            "single-bigG conditioning has no base-model counterpart to "
            "compose the token into) — invert on the base model instead")
    if tcfg.train_controlnet:
        if tcfg.lora_rank > 0 or tcfg.ti_token:
            raise ValueError("train_controlnet is a full-branch mode; it "
                             "cannot combine with lora_rank/ti_token")
        if tcfg.train_unet or tcfg.train_text_encoder:
            raise ValueError(
                "train_controlnet freezes the whole base model (the "
                "arXiv:2302.05543 protocol) — unset train_unet/"
                "train_text_encoder rather than having them silently ignored")
        if "controlnet" not in params:
            raise ValueError(
                "train_controlnet needs params['controlnet'] — attach one "
                "with models.controlnet.from_unet(params['unet'], ...) or "
                "port a checkpoint (models/port.load_controlnet)")
        if isinstance(params["controlnet"], (list, tuple)):
            raise ValueError(
                "train_controlnet trains ONE branch (multi-ControlNet is a "
                "serving composition — residuals sum at sampling time); "
                "train branches separately and attach them together with "
                "a comma-separated --controlnet_path")
    if tcfg.ti_token:
        # textual inversion: everything freezes; the trainable tree is the
        # appended embedding rows, concatenated inside the loss (merge)
        from sdbc_tpu.train import textual_inversion as ti_mod

        if tcfg.lora_rank > 0:
            raise ValueError("ti_token and lora_rank are mutually exclusive")
        t = {"rows": ti_mod.init_rows(
            params["text_encoder"]["token_embedding"]["table"],
            tcfg.ti_vectors, init_ids=ti_init_ids)}
        if tcfg.dual_text_encoder:
            # SDXL: the placeholder registers at the SAME appended ids in
            # both tokenizers (identical BPE base vocabularies), so each
            # encoder learns its own rows for those ids
            t["rows2"] = ti_mod.init_rows(
                params["text_encoder_2"]["token_embedding"]["table"],
                tcfg.ti_vectors, init_ids=ti_init_ids)
        frozen = {k: cast_floating(v, compute_dtype)
                  for k, v in params.items()}
        return {"ti": t}, frozen
    if tcfg.lora_rank > 0:
        # LoRA: EVERY component freezes to bf16; the trainable tree is the
        # flat adapter dict (fp32 masters), merged inside the loss
        from sdbc_tpu.train import lora as lora_mod

        lora = lora_mod.init_lora(
            key if key is not None else jax.random.key(0),
            params, tcfg.lora_rank, components=tkeys)
        frozen = {k: cast_floating(v, compute_dtype)
                  for k, v in params.items()}
        return {"lora": lora}, frozen
    trainable = {k: params[k] for k in tkeys}
    frozen = {k: cast_floating(v, compute_dtype)
              for k, v in params.items() if k not in tkeys}
    return trainable, frozen


def make_optimizer(tcfg: TrainConfig, dp_size: int = 1) -> optax.GradientTransformation:
    # scale_lr semantics (finetune_sd.py:367-371): lr × grad_accum ×
    # batch_size × num_processes, opt-in
    scale = (tcfg.grad_accum * tcfg.micro_batch * dp_size
             if tcfg.lr_scale_by_dp else 1)
    lr = tcfg.learning_rate * scale
    if lr > 0:
        schedule = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=max(tcfg.num_examples, 1),
            alpha=tcfg.eta_min / lr)
    else:
        schedule = optax.constant_schedule(0.0)
    txs = []
    if tcfg.max_grad_norm > 0:
        txs.append(optax.clip_by_global_norm(tcfg.max_grad_norm))
    if tcfg.use_8bit_adam:
        from sdbc_tpu.train.adam8bit import adamw8bit

        txs.append(adamw8bit(schedule, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=tcfg.weight_decay))
    else:
        txs.append(optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                               weight_decay=tcfg.weight_decay))
    # NaN guard: non-finite grads skip the update (reference would
    # breakpoint() on NaN loss, finetune_sd.py:491-493)
    return optax.apply_if_finite(optax.chain(*txs), max_consecutive_errors=10 ** 8)


def init_train_state(params, tcfg: TrainConfig, dp_size: int = 1,
                     compute_dtype=jnp.bfloat16, key=None,
                     ti_init_ids=None) -> TrainState:
    """``key`` seeds the LoRA a-init when tcfg.lora_rank > 0 (b is zero,
    so the adapted model is exactly the base at step 0 either way).
    ``ti_init_ids``: token ids of the textual-inversion initializer word
    (tcfg.ti_token mode only)."""
    if not tcfg.trainable_keys() and not tcfg.ti_token:
        # the reference's torch optimizer raises 'empty parameter list'
        # here; without this a full run executes and updates nothing
        raise ValueError(
            "nothing to train: set train_unet and/or train_text_encoder")
    trainable, frozen = _split_params(params, tcfg, compute_dtype, key=key,
                                      ti_init_ids=ti_init_ids)
    opt = make_optimizer(tcfg, dp_size)
    # EMA starts as a COPY (jnp.array) of the masters: the donated train
    # step would otherwise alias-invalidate the shared buffers on step 1
    ema = (jax.tree.map(jnp.array, trainable) if tcfg.ema_decay > 0
           else None)
    return TrainState(trainable=trainable, frozen=frozen,
                      opt_state=opt.init(trainable),
                      step=jnp.zeros((), jnp.int32), ema=ema)


def _merge(trainable, frozen, tcfg: TrainConfig):
    """Full {text_encoder, unet, vae} param tree from a state's halves."""
    if "ti" in trainable:
        from sdbc_tpu.train import textual_inversion as ti_mod

        return ti_mod.merge(dict(frozen), trainable["ti"]["rows"],
                            rows2=trainable["ti"].get("rows2"))
    if "lora" in trainable and tcfg is not None and tcfg.lora_rank > 0:
        from sdbc_tpu.train import lora as lora_mod

        return lora_mod.apply_lora(dict(frozen), trainable["lora"],
                                   tcfg.lora_scale)
    out = dict(frozen)
    out.update(trainable)
    return out


def merged_params(state: TrainState, tcfg: Optional[TrainConfig] = None,
                  use_ema: bool = False):
    """Full {text_encoder, unet, vae} tree for inference/checkpointing.

    LoRA states (trainable == {"lora": ...}) need ``tcfg`` for the
    alpha/rank scale; passing none raises rather than silently serving
    the unadapted base.  ``use_ema=True`` merges the EMA shadow instead of
    the raw masters (raises if the state carries no EMA — silently serving
    raw weights when the caller asked for EMA would be a quality bug).
    """
    trainable = state.trainable
    if use_ema:
        if state.ema is None:
            raise ValueError("use_ema=True on a state with no EMA shadow "
                             "(train with TrainConfig.ema_decay > 0)")
        trainable = state.ema
    if "lora" in trainable and (tcfg is None or tcfg.lora_rank <= 0):
        raise ValueError("merged_params on a LoRA state needs the "
                         "TrainConfig (for the alpha/rank merge scale)")
    return _merge(trainable, state.frozen, tcfg)


def diffusion_loss(trainable, frozen, batch, key, cfg: PipelineConfig,
                   tcfg: TrainConfig, sched: sched_mod.Schedule,
                   compute_dtype=jnp.bfloat16, attn_impl: str = "auto",
                   data_sharded=None):
    """Single-micro-batch denoising MSE (reference finetune_sd.py:460-483)."""
    # LoRA: merge the low-rank deltas into the frozen base INSIDE the loss
    # so autodiff reaches exactly {a, b}; otherwise overlay the trainable
    # components over the frozen ones
    params = _merge(trainable, frozen, tcfg)
    dt = compute_dtype
    prior_n = 0
    if tcfg.prior_weight > 0:
        # prior preservation: fold the class batch onto the instance batch
        # so the whole micro-step stays ONE VAE encode + ONE UNet call
        # (bigger MXU tiles instead of a second half-sized dispatch); the
        # per-example losses are re-split below
        prior = {k[len("prior_"):]: v for k, v in batch.items()
                 if k.startswith("prior_")}
        if "input_ids" not in prior or ("pixel_values" in batch
                                        and "pixel_values" not in prior):
            raise ValueError(
                "prior_weight > 0 needs prior_pixel_values + "
                "prior_input_ids in every micro-batch (train/prior.py "
                "augment_loader); cached latents are not supported for "
                "the prior set")
        if "latent_mean" in batch:
            raise ValueError("prior_weight > 0 is incompatible with "
                             "--cache_latents (the class set has no "
                             "latent cache) — drop one of the two")
        prior_n = prior["input_ids"].shape[0]
        batch = {k: jnp.concatenate([v, prior[k]], axis=0)
                 for k, v in batch.items() if not k.startswith("prior_")}
    ids = batch["input_ids"]                           # (B, ctx) int32

    kvae, knoise, kt = jax.random.split(key, 3)
    if "latent_mean" in batch:
        # --cache_latents mode: posterior moments were precomputed once per
        # dataset (train/latent_cache.py) — the encode is deterministic and
        # stop-gradient so sampling from cached moments with fresh noise is
        # exactly the on-the-fly objective, minus the whole VAE forward.
        # fp32-stored moments cast back to dt: lossless bf16 round trip.
        mean = batch["latent_mean"].astype(dt)
        logvar = batch["latent_logvar"].astype(dt)
    else:
        pixels = batch["pixel_values"].astype(dt)      # (B, H, W, 3) in [-1,1]
        if vae_mod.prefer_chunked_encode(pixels.shape[0], pixels.shape[1],
                                         pixels.shape[2],
                                         data_sharded=data_sharded):
            # encode image-by-image at 512²-class sizes: XLA's spatial tiling
            # of the batched encode is pathological (see prefer_chunked_encode
            # for the numbers + the single-device restriction); encode is
            # stop-gradient so the map adds no autodiff cost
            mean, logvar = vae_mod.encode_moments_chunked(params["vae"],
                                                          pixels, cfg.vae)
        else:
            mean, logvar = vae_mod.encode_moments(params["vae"], pixels,
                                                  cfg.vae)
    latents = vae_mod.sample(mean, logvar, kvae) * cfg.vae.scaling_factor
    latents = jax.lax.stop_gradient(latents.astype(jnp.float32))

    noise = jax.random.normal(knoise, latents.shape, jnp.float32)
    bsz = latents.shape[0]
    if tcfg.noise_offset > 0:
        # offset noise: a per-(example, channel) constant added to the
        # noise lets the model shift global brightness (plain eps noise is
        # zero-mean per channel, so brightness is otherwise pinned)
        knoise, koff = jax.random.split(knoise)
        noise = noise + tcfg.noise_offset * jax.random.normal(
            koff, (bsz,) + (1,) * (latents.ndim - 2) + latents.shape[-1:],
            jnp.float32)
    t = jax.random.randint(kt, (bsz,), 0, cfg.schedule.num_train_timesteps)
    noisy = sched_mod.ddpm_add_noise(sched, latents, noise, t).astype(dt)

    added_cond = None
    if cfg.clip2 is not None:
        # SDXL conditioning: concatenated dual-encoder context + the
        # text_time addition embedding.  Training images are plain bicubic
        # resizes (data/dataset.py decode_and_prepare — no cropping), so the
        # size/crop micro-conditioning is the uncropped native-resolution
        # sextuple (S, S, 0, 0, S, S) with S recovered from the latent grid
        # (f = 2^(levels-1), 8 for the SDXL VAE).
        if "input_ids_2" not in batch:
            raise ValueError(
                "SDXL training (cfg.clip2 set) needs batch['input_ids_2'] "
                "from the second tokenizer — build GoodreadsDataset with "
                "tokenizer2 (the finetune CLI does this automatically)")
        ctx, pooled = encode_text_xl(params, ids, batch["input_ids_2"],
                                     cfg, dt)
        s = latents.shape[1] * 2 ** (len(cfg.vae.block_out_channels) - 1)
        if cfg.refiner:
            # refiner micro-conditioning: (orig, crop, aesthetic score);
            # training images are treated as high-quality targets — the
            # constant 6.0 the diffusers fine-tuning scripts use
            tid = jnp.asarray([s, s, 0, 0, 6.0], jnp.float32)
        else:
            tid = jnp.asarray([s, s, 0, 0, s, s], jnp.float32)
        time_ids = jnp.broadcast_to(tid, (bsz, tid.shape[0]))
        added_cond = _xl_added_cond(pooled, time_ids,
                                    cfg.unet.addition_time_embed_dim)
    else:
        ctx = clip_mod.apply(params["text_encoder"], ids, cfg.clip,
                             compute_dtype=dt)
    control_residuals = None
    if tcfg.train_controlnet:
        from sdbc_tpu.models import controlnet as cn_mod

        if cfg.controlnet is None:
            raise ValueError("train_controlnet needs cfg.controlnet "
                             "(PipelineConfig.with_controlnet)")
        if "pixel_values" not in batch:
            raise ValueError("train_controlnet derives its conditioning "
                             "hint from the pixel batch — incompatible "
                             "with cached latents")
        hint = cn_mod.training_hint(batch["pixel_values"], tcfg.control_hint)
        cond_emb = cn_mod.embed_cond(params["controlnet"], hint.astype(dt),
                                     cfg.controlnet)
        control_residuals = cn_mod.apply(
            params["controlnet"], noisy, t, ctx, cond_emb, cfg.controlnet,
            remat=tcfg.grad_ckpt, attn_impl=attn_impl,
            added_cond=added_cond)
    pred = unet_mod.apply(params["unet"], noisy, t, ctx, cfg.unet,
                          remat=tcfg.grad_ckpt, remat_mode=tcfg.remat_mode,
                          attn_impl=attn_impl,
                          control_residuals=control_residuals,
                          added_cond=added_cond)
    if cfg.schedule.prediction_type == "v_prediction":
        target = sched_mod.velocity_target(sched, latents, noise, t)
    else:  # epsilon (the reference's objective, finetune_sd.py:483)
        target = noise
    # fp32 MSE, mean over pixels then batch (reference :483)
    per_ex = jnp.mean((pred.astype(jnp.float32) - target) ** 2,
                      axis=tuple(range(1, pred.ndim)))
    if tcfg.min_snr_gamma > 0:
        # min-SNR weighting (arXiv:2303.09556): SNR_t = ā/(1-ā);
        # eps objective weight = min(SNR, γ)/SNR, v = min(SNR, γ)/(SNR+1)
        a = sched.alphas_cumprod[t].astype(jnp.float32)
        snr = a / jnp.maximum(1.0 - a, 1e-8)
        denom = (snr + 1.0 if cfg.schedule.prediction_type == "v_prediction"
                 else jnp.maximum(snr, 1e-8))
        per_ex = per_ex * jnp.minimum(snr, tcfg.min_snr_gamma) / denom
    if prior_n:
        # DreamBooth objective: instance mean + weighted class-prior mean
        # (diffusers train_dreambooth with_prior_preservation semantics)
        return (jnp.mean(per_ex[:-prior_n])
                + tcfg.prior_weight * jnp.mean(per_ex[-prior_n:]))
    return jnp.mean(per_ex)


def make_train_step(cfg: PipelineConfig, tcfg: TrainConfig, mesh=None,
                    dp_size: int = 1, compute_dtype=jnp.bfloat16,
                    donate: bool = False, cached_latents: bool = False):
    """Build the jitted train step.

    The step consumes a *global* batch shaped (grad_accum, micro_bsz, ...)
    pytree {"pixel_values", "input_ids"}; micro-batches are scanned (the
    gradient accumulation loop lives INSIDE the compiled graph, so TPUs never
    sync with the host between micro-steps), gradients are averaged, and one
    optimizer update is applied.  Under a mesh, batch dims are sharded over
    ``data`` and XLA inserts the gradient psum.
    """
    if tcfg.refiner != getattr(cfg, "refiner", False):
        # same desync discipline as dual_text_encoder below: the refiner
        # flag changes which encoders exist AND the micro-conditioning
        raise ValueError(
            f"TrainConfig.refiner={tcfg.refiner} but cfg.refiner="
            f"{getattr(cfg, 'refiner', False)} — set TrainConfig.refiner "
            "iff the PipelineConfig is an SDXL refiner")
    if tcfg.refiner and not tcfg.dual_text_encoder:
        raise ValueError("refiner training implies dual_text_encoder=True "
                         "(the refiner IS an SDXL-family config; its one "
                         "encoder is text_encoder_2)")
    if tcfg.dual_text_encoder != cfg.is_sdxl:
        # the two flags encode one fact (the finetune CLI derives the
        # TrainConfig field from cfg.is_sdxl); a desync would either crash
        # the mesh sharding spec or silently freeze text_encoder_2 while
        # text_encoder trains — fail loudly instead
        raise ValueError(
            f"TrainConfig.dual_text_encoder={tcfg.dual_text_encoder} but "
            f"cfg.clip2 is {'set' if cfg.is_sdxl else 'None'} — set "
            "dual_text_encoder iff the PipelineConfig is SDXL")
    if tcfg.prior_weight > 0 and cached_latents:
        raise ValueError("prior_weight (prior preservation) is incompatible "
                         "with cached latents — the class set has no latent "
                         "cache; drop --cache_latents")
    sched = sched_mod.make_schedule(cfg.schedule)
    opt = make_optimizer(tcfg, dp_size)
    # TP training: model-axis-sharded q/k/v must take the partitionable XLA
    # attention path — a pallas_call is opaque to the SPMD partitioner
    attn_impl = ("xla" if mesh is not None and mesh.shape.get("model", 1) > 1
                 else "auto")
    loss_fn = functools.partial(
        diffusion_loss, cfg=cfg, tcfg=tcfg, sched=sched,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
        # the trainer KNOWS whether the batch is sharded; don't guess from
        # device_count (wrong for single-device runs on multi-chip hosts)
        data_sharded=mesh is not None and mesh.shape["data"] > 1)

    def step_fn(state: TrainState, batch, key):
        def micro(carry, xs):
            gsum, lsum = carry
            mb, k = xs
            loss, g = jax.value_and_grad(loss_fn)(
                state.trainable, state.frozen, mb, k)
            gsum = jax.tree.map(jnp.add, gsum, g)
            return (gsum, lsum + loss), None

        keys = jax.random.split(key, tcfg.grad_accum)
        gzero = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32),
                             state.trainable)
        (gsum, lsum), _ = jax.lax.scan(micro, (gzero, jnp.zeros(())),
                                       (batch, keys))
        grads = jax.tree.map(lambda g: g / tcfg.grad_accum, gsum)
        loss = lsum / tcfg.grad_accum

        updates, new_opt = opt.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)

        new_ema = state.ema
        if tcfg.ema_decay > 0:
            # warmup-ramped decay (diffusers EMAModel convention): early
            # steps weight fresh params heavily, converging to ema_decay.
            # t = number of COMPLETED updates after this one.  A NaN-skipped
            # step (apply_if_finite zero update) decays toward unchanged
            # params — a no-op in the limit, harmless.
            t = (state.step + 1).astype(jnp.float32)
            d = jnp.minimum(tcfg.ema_decay, (1.0 + t) / (10.0 + t))
            new_ema = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d), state.ema, new_trainable)

        new_state = TrainState(new_trainable, state.frozen, new_opt,
                               state.step + 1, new_ema)
        # "finite" reflects what apply_if_finite actually checked — the
        # UPDATE tree (a finite fp32 loss can still hide an inf in the bf16
        # backward, silently skipping the step); total_notfinite is the
        # CUMULATIVE dropped-update count (notfinite_count is the
        # consecutive counter, reset to 0 by every finite step — reporting
        # it would hide intermittent NaN streaks)
        return new_state, {"loss": loss,
                           "finite": new_opt.last_finite,
                           "notfinite_count": new_opt.total_notfinite}

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)

    repl = NamedSharding(mesh, P())
    # batch leading dims: (accum, micro) — shard micro over data axis
    sh = NamedSharding(mesh, P(None, "data"))
    data_keys = (("latent_mean", "latent_logvar") if cached_latents
                 else ("pixel_values",)) + ("input_ids",)
    if tcfg.dual_text_encoder:  # SDXL: second tokenizer's ids ride along
        data_keys += ("input_ids_2",)
    if tcfg.prior_weight > 0:  # class batch shards alongside the instance
        data_keys += tuple("prior_" + k for k in data_keys)
    batch_sh = {k: sh for k in data_keys}
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_sh, repl),
        out_shardings=(None, repl),
        **donate_kw,
    )
