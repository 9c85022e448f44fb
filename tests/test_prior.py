"""Prior-preservation (DreamBooth) tests: loss weighting, train step,
class-image batcher, self-generation (train/prior.py, trainer.prior_weight).

Beyond the reference (plain fine-tuning only, finetune_sd.py:374-399);
protocol per Ruiz et al. 2022, arXiv:2208.12242 / diffusers
train_dreambooth with_prior_preservation semantics.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.diffusion import schedulers as sched_mod
from sdbc_tpu.train.trainer import (TrainConfig, _split_params,
                                    diffusion_loss, init_train_state,
                                    make_train_step)


def _batches(cfg, micro=2, prior=2, key=7):
    k1, k2 = jax.random.split(jax.random.key(key))
    return {
        "pixel_values": jax.random.normal(k1, (micro, 32, 32, 3)) * 0.5,
        "input_ids": jnp.ones((micro, cfg.clip.ctx), jnp.int32),
        "prior_pixel_values": jax.random.normal(
            k2, (prior, 32, 32, 3)) * 0.5,
        "prior_input_ids": jnp.full((prior, cfg.clip.ctx), 2, jnp.int32),
    }


def _loss_at(w, tiny_cfg, tiny_params, batch, key):
    tcfg = TrainConfig(train_unet=True, train_text_encoder=False,
                       grad_accum=1, prior_weight=w)
    trainable, frozen = _split_params(tiny_params, tcfg, jnp.float32)
    sched = sched_mod.make_schedule(tiny_cfg.schedule)
    return float(diffusion_loss(trainable, frozen, batch, key,
                                cfg=tiny_cfg, tcfg=tcfg, sched=sched,
                                compute_dtype=jnp.float32))


def test_loss_linear_in_prior_weight(tiny_cfg, tiny_params):
    """loss = L_i + w*L_p: same key + same combined batch shape across
    calls, so varying w isolates the weighting arithmetic exactly."""
    batch = _batches(tiny_cfg)
    key = jax.random.key(3)
    l0, l1, l2 = (_loss_at(w, tiny_cfg, tiny_params, batch, key)
                  for w in (0.5, 1.0, 1.5))
    lp = l1 - l0  # = 0.5 * L_prior
    assert lp > 0  # random-init prior MSE is strictly positive
    np.testing.assert_allclose(l2 - l1, lp, rtol=1e-4)


def test_prior_batch_keys_required(tiny_cfg, tiny_params):
    batch = _batches(tiny_cfg)
    del batch["prior_pixel_values"]
    with pytest.raises(ValueError, match="prior_pixel_values"):
        _loss_at(1.0, tiny_cfg, tiny_params, batch, jax.random.key(0))


def test_cached_latents_rejected(tiny_cfg, tiny_params):
    tcfg = TrainConfig(train_unet=True, train_text_encoder=False,
                       grad_accum=1, prior_weight=1.0)
    with pytest.raises(ValueError, match="latent cache"):
        make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32,
                        cached_latents=True)


def test_train_step_with_prior_decreases_loss(tiny_cfg, tiny_params):
    tcfg = TrainConfig(train_unet=True, train_text_encoder=True,
                       grad_accum=1, learning_rate=1e-3, num_examples=100,
                       prior_weight=1.0)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    b = _batches(tiny_cfg)
    batch = {k: v[None] for k, v in b.items()}  # (accum=1, micro, ...)
    key = jax.random.key(42)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.fixture()
def class_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "class"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            d / f"c{i}.png")
    return str(d)


def test_prior_set_batches(class_dir, tiny_cfg):
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.train.prior import PriorSet

    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    ps = PriorSet(class_dir, "a book cover", tok, img_size=32,
                  max_length=tiny_cfg.clip.ctx)
    assert len(ps) == 3
    g1, g2 = (ps.batches(micro_batch=2, grad_accum=2, seed=5)
              for _ in range(2))
    a, b = next(g1), next(g2)
    assert a["prior_pixel_values"].shape == (2, 2, 32, 32, 3)
    assert a["prior_input_ids"].shape == (2, 2, tiny_cfg.clip.ctx)
    np.testing.assert_array_equal(a["prior_pixel_values"],
                                  b["prior_pixel_values"])  # deterministic
    assert -1.0 <= a["prior_pixel_values"].min() <= 1.0
    # the 3-image set cycles: two steps consume 8 draws without raising
    next(g1)


def test_prior_set_empty_dir_raises(tmp_path, tiny_cfg):
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.train.prior import PriorSet

    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    with pytest.raises(ValueError, match="no class images"):
        PriorSet(str(tmp_path), "a book cover", tok, img_size=32)


def test_augment_loader(class_dir, tiny_cfg):
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.train.prior import PriorSet, augment_loader

    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    ps = PriorSet(class_dir, "a book cover", tok, img_size=32,
                  max_length=tiny_cfg.clip.ctx)
    inst = [{"pixel_values": np.zeros((1, 2, 32, 32, 3), np.float32),
             "input_ids": np.ones((1, 2, tiny_cfg.clip.ctx), np.int32)}
            for _ in range(2)]
    merged = list(augment_loader(iter(inst), ps.batches(2, 1, seed=1)))
    assert len(merged) == 2
    assert set(merged[0]) == {"pixel_values", "input_ids",
                              "prior_pixel_values", "prior_input_ids"}
    assert merged[0]["prior_pixel_values"].shape == (1, 2, 32, 32, 3)


def test_generate_class_images_tops_up(class_dir, tiny_cfg, tiny_params):
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline
    from sdbc_tpu.train.prior import generate_class_images

    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    pipe = SDPipeline(tiny_params, tiny_cfg, tok,
                      compute_dtype=jnp.float32)
    made = generate_class_images(pipe, "a book cover", 5, class_dir,
                                 img_size=32, batch_size=2,
                                 num_inference_steps=2, seed=0,
                                 log=lambda *_: None)
    assert made == 2  # 3 existing count toward the quota
    files = sorted(os.listdir(class_dir))
    assert len(files) == 5
    # idempotent: quota already met
    assert generate_class_images(pipe, "a book cover", 5, class_dir,
                                 img_size=32, batch_size=2,
                                 num_inference_steps=2,
                                 log=lambda *_: None) == 0


def test_prior_set_missing_dir_raises(tmp_path, tiny_cfg):
    """--prior_images_dir at a nonexistent path gets the curated guidance,
    not a raw FileNotFoundError."""
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.train.prior import PriorSet

    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    with pytest.raises(ValueError, match="no class images"):
        PriorSet(str(tmp_path / "nope"), "a book cover", tok, img_size=32)


def test_generate_class_images_never_overwrites(tmp_path, tiny_cfg,
                                                tiny_params):
    """Pre-existing class-NNNNN names (possibly non-contiguous) are skipped
    when assigning output paths, so user images survive and the directory
    really reaches the quota."""
    from PIL import Image

    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline
    from sdbc_tpu.train.prior import generate_class_images

    d = tmp_path / "class"
    d.mkdir()
    marker = np.full((32, 32, 3), 7, np.uint8)
    Image.fromarray(marker).save(d / "class-00001.png")  # offset name
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    pipe = SDPipeline(tiny_params, tiny_cfg, tok, compute_dtype=jnp.float32)
    made = generate_class_images(pipe, "a book cover", 3, str(d),
                                 img_size=32, batch_size=2,
                                 num_inference_steps=2, seed=0,
                                 log=lambda *_: None)
    assert made == 2
    files = sorted(os.listdir(d))
    assert len(files) == 3  # quota actually met on disk
    got = np.asarray(Image.open(d / "class-00001.png"))
    np.testing.assert_array_equal(got, marker)  # untouched
