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


def test_profile_spec_reaches_pipeline(tmp_path, tiny_cfg):
    """Round-5 regression: --cache_interval/--karras_sigmas were silently
    dropped on the calc_fid and grids paths (the deepcache ladder point
    produced bit-identical images to plain dpm).  The eval drivers must
    forward the profile spec into pipeline.generate."""
    import pandas as pd

    from sdbc_tpu.diffusion.spec import SampleSpec
    from sdbc_tpu.eval.generate import get_fid_images

    seen = []

    class Rec:
        cfg = tiny_cfg

        def generate(self, prompts, spec):
            seen.append(spec)
            return np.zeros((len(prompts), 32, 32, 3), np.float32)

    df = pd.DataFrame({"book_authors": ["a"], "book_title": ["t"]})
    prof = SampleSpec(cache_interval=3, cache_tail=1,
                      use_karras_sigmas=True)
    get_fid_images(Rec(), str(tmp_path), df, num_imgs=1, batch_size=1,
                   img_size=32, inference_steps=4, verbose=False,
                   spec=prof)
    assert seen and seen[0].cache_interval == 3
    assert seen[0].use_karras_sigmas is True
    assert seen[0].num_inference_steps == 4  # pinned by explicit args

    seen.clear()
    visualize_prompts(Rec(), img_size=32, inference_steps=4,
                      samples_per_prompt=1,
                      test_templates=["x", "y"], spec=prof)
    assert seen and all(s.cache_interval == 3 for s in seen)
