"""Prompt-grid visualisation: fixed-latent reproducibility + file naming."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion.pipeline import SDPipeline
from sdbc_tpu.eval.visualize import visualize_prompts


@pytest.fixture(scope="module")
def pipe(tiny_cfg, tiny_params):
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    return SDPipeline(tiny_params, tiny_cfg, tok, compute_dtype=jnp.float32)


TT = ["a test cover one", "a test cover two"]


def test_grid_reproducible(pipe, tmp_path):
    imgs1, prompts, path = visualize_prompts(
        pipe, samples_per_prompt=1, img_size=32, inference_steps=2,
        save_dir=str(tmp_path), test_templates=TT)
    imgs2, _, _ = visualize_prompts(
        pipe, samples_per_prompt=1, img_size=32, inference_steps=2,
        test_templates=TT)
    np.testing.assert_array_equal(imgs1, imgs2)  # fixed latents + seed
    assert os.path.exists(path)
    assert "summerize=False,include_desc=False" in os.path.basename(path)
    assert len(prompts) == 2


def test_samples_per_prompt(pipe):
    imgs, prompts, _ = visualize_prompts(
        pipe, samples_per_prompt=2, img_size=32, inference_steps=2,
        test_templates=TT[:1])
    assert imgs.shape[0] == 2
    assert prompts == [TT[0], TT[0]]
    # different latents per sample → different images
    assert not np.allclose(imgs[0], imgs[1])


def test_summarize_requires_include_desc(pipe):
    with pytest.raises(ValueError):
        visualize_prompts(pipe, summarize=True, include_desc=False)


def test_summarize_path(pipe):
    summaries = {"d1": "a lost heirloom", "d2": "a sea voyage"}
    imgs, prompts, _ = visualize_prompts(
        pipe, summarize=True, include_desc=True,
        summarizer=lambda text, max_length=15: summaries[text],
        descriptions=["d1", "d2"], samples_per_prompt=1, img_size=32,
        inference_steps=2, test_templates=TT)
    assert any("a lost heirloom" in p for p in prompts)


def test_include_desc_without_summarize_appends_raw_desc(pipe):
    """The reference appends the RAW description when include_desc is set
    without summarize (inference.py:324-330) — the (F,T) grid must not be
    a silent duplicate of the (F,F) grid."""
    plain, plain_prompts, _ = visualize_prompts(
        pipe, samples_per_prompt=1, img_size=32, inference_steps=2,
        test_templates=TT)
    desc, desc_prompts, _ = visualize_prompts(
        pipe, include_desc=True, descriptions=["raw desc one", "raw desc two"],
        samples_per_prompt=1, img_size=32, inference_steps=2,
        test_templates=TT)
    assert any("raw desc one" in p for p in desc_prompts)
    assert desc_prompts != plain_prompts
    assert not np.allclose(plain, desc)
    with pytest.raises(ValueError, match="descriptions"):
        visualize_prompts(pipe, include_desc=True, samples_per_prompt=1,
                          img_size=32, inference_steps=2, test_templates=TT)
