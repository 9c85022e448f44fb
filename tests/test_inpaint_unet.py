"""Dedicated 9-channel inpainting UNet family (runwayml/sd-inpainting layout).

The diffusers StableDiffusionInpaintPipeline's channel-concat protocol:
conv_in takes latent ⧺ mask ⧺ masked-image-latent (2·C+1 channels), the
mask/masked-image conditioning rides as extra input channels on every UNet
call, and sampling is a full denoise from pure noise (no per-step blend).
Beyond the reference (its engine pins diffusers 0.7.2, whose inpaint
pipeline is the legacy blend this repo also implements in test_img2img.py).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion.pipeline import PipelineConfig, SDPipeline
from sdbc_tpu.models import clip, port, unet, vae


@pytest.fixture(scope="module")
def in_cfg(tiny_cfg) -> PipelineConfig:
    lc = tiny_cfg.vae.latent_channels
    return dataclasses.replace(
        tiny_cfg, unet=dataclasses.replace(tiny_cfg.unet,
                                           in_channels=2 * lc + 1))


@pytest.fixture(scope="module")
def in_params(in_cfg):
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    return {"text_encoder": clip.init(k1, in_cfg.clip),
            "unet": unet.init(k2, in_cfg.unet),
            "vae": vae.init(k3, in_cfg.vae)}


@pytest.fixture(scope="module")
def in_pipe(in_cfg, in_params):
    tok = CLIPTokenizer.fallback(in_cfg.clip.vocab_size)
    return SDPipeline(in_params, in_cfg, tok, compute_dtype=jnp.float32)


def _img_and_mask():
    img = np.random.default_rng(0).uniform(size=(1, 32, 32, 3)) \
        .astype(np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    return img, mask


def test_config_classification(in_cfg, tiny_cfg):
    assert in_cfg.is_inpaint_unet
    assert not tiny_cfg.is_inpaint_unet
    assert in_cfg.latent_channels == tiny_cfg.vae.latent_channels


def test_inpaint_runs_and_is_deterministic(in_pipe):
    img, mask = _img_and_mask()
    a = in_pipe.inpaint(["a book cover"], img, mask, num_inference_steps=3)
    b = in_pipe.inpaint(["a book cover"], img, mask, num_inference_steps=3)
    assert a.shape == (1, 32, 32, 3)
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)


def test_mask_and_image_condition_the_unet(in_pipe):
    """Different masks / different init images must change the output —
    i.e. the extra channels really reach conv_in on every step."""
    img, mask = _img_and_mask()
    base = in_pipe.inpaint(["c"], img, mask, num_inference_steps=2)
    mask2 = np.zeros((32, 32), np.float32)
    mask2[0:8, 0:8] = 1.0
    other_mask = in_pipe.inpaint(["c"], img, mask2, num_inference_steps=2)
    assert not np.allclose(base, other_mask)
    img2 = np.roll(img, 5, axis=1)
    other_img = in_pipe.inpaint(["c"], img2, mask, num_inference_steps=2)
    assert not np.allclose(base, other_img)


def test_t2i_and_bare_img2img_rejected(in_pipe):
    img, _ = _img_and_mask()
    with pytest.raises(ValueError, match="inpainting UNet"):
        in_pipe(["t"], height=32, width=32, num_inference_steps=2)
    with pytest.raises(ValueError, match="inpainting UNet"):
        in_pipe.img2img(["t"], img, strength=0.5, num_inference_steps=2)


def test_cache_interval_rejected(in_pipe):
    img, mask = _img_and_mask()
    with pytest.raises(ValueError, match="cache_interval"):
        in_pipe.inpaint(["t"], img, mask, num_inference_steps=4,
                        cache_interval=2)


def test_cfg_interval_composes(in_pipe):
    """The cond-only branch concatenates the same extra channels."""
    img, mask = _img_and_mask()
    gs1 = in_pipe.inpaint(["c"], img, mask, num_inference_steps=3,
                          guidance_scale=1.0)
    off = in_pipe.inpaint(["c"], img, mask, num_inference_steps=3,
                          cfg_interval=(0.0, 0.0))
    np.testing.assert_allclose(gs1, off, atol=1e-5)


def test_multistep_schedulers_allowed(in_cfg, in_params):
    """No per-step blend → unipc/lms/pndm restrictions don't apply to the
    channel-concat protocol (unipc's corrector state stays valid)."""
    img, mask = _img_and_mask()
    for sched in ("unipc", "dpm"):
        cfg = dataclasses.replace(in_cfg, scheduler=sched)
        tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
        p = SDPipeline(in_params, cfg, tok, compute_dtype=jnp.float32)
        out = p.inpaint(["s"], img, mask, num_inference_steps=3)
        assert np.isfinite(out).all()


def test_export_port_roundtrip(tmp_path, in_cfg, in_params):
    """A 9-channel UNet roundtrips through the diffusers dir layout and is
    classified as an inpainting pipeline on re-load (runwayml config:
    in_channels=9, out_channels=4)."""
    d = str(tmp_path / "inpaint")
    port.export_diffusers_checkpoint(in_params, in_cfg, d)
    cfg2 = port.pipeline_config_from_diffusers(d)
    assert cfg2.unet.in_channels == in_cfg.unet.in_channels
    assert cfg2.unet.out_channels == in_cfg.unet.out_channels
    assert cfg2.is_inpaint_unet
    back = port.port_diffusers_checkpoint(d)
    for a, b in zip(jax.tree_util.tree_leaves(in_params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
