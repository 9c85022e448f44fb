"""CLIPScore evaluator: transformers CLIPModel parity + score semantics.

Beyond the reference (FID is its only metric, /root/reference/fid.py);
protocol per Hessel et al. 2021, arXiv:2104.08718.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_hf_clip():
    from transformers import CLIPConfig, CLIPModel
    from transformers import CLIPTextConfig as HTC
    from transformers import CLIPVisionConfig as HVC
    import torch

    cfg = CLIPConfig.from_text_vision_configs(
        HTC(vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16, eos_token_id=98, bos_token_id=97),
        HVC(hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, image_size=32, patch_size=8),
        projection_dim=16)
    torch.manual_seed(11)
    return CLIPModel(cfg).eval()


def test_clip_model_port_parity_vs_transformers(tmp_path):
    """clip_model_from_dir ports a full transformers CLIPModel dir; the
    per-pair cosines match transformers' get_text/image_features."""
    import torch

    from sdbc_tpu.eval.clip_score import _embed
    from sdbc_tpu.models.port import clip_model_from_dir

    hf = _tiny_hf_clip()
    hf.save_pretrained(tmp_path)
    params, tcfg, vcfg = clip_model_from_dir(str(tmp_path))
    assert tcfg.vocab_size == 99 and tcfg.projection_dim == 16
    assert vcfg.image_size == 32 and vcfg.patch == 8

    rng = np.random.default_rng(4)
    ids = np.full((2, 16), 5, np.int64)
    ids[:, 0] = 97
    ids[0, 6] = 98  # first eos position differs per row
    ids[1, 11] = 98
    pix = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        t = hf.get_text_features(input_ids=torch.from_numpy(ids))
        v = hf.get_image_features(pixel_values=torch.from_numpy(
            pix.transpose(0, 3, 1, 2)))
        ref = torch.nn.functional.cosine_similarity(t, v).numpy()

    # eot position: the HF eos id 98 is not vocab_size-1 → pass explicitly
    # via cfg.eot_id (the port can't know the tokenizer's ids)
    import dataclasses

    tcfg = dataclasses.replace(tcfg, eot_id=98)
    got = np.asarray(_embed(params, jnp.asarray(ids, jnp.int32),
                            jnp.asarray(pix), text_cfg=tcfg,
                            vision_cfg=vcfg))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_clip_scorer_score_semantics(tiny_cfg):
    """score = 2.5*max(cos, 0); shape/validation plumbing on random init
    (meaningless values, exercised end-to-end incl. preprocessing)."""
    import dataclasses

    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.eval.clip_score import ClipScorer
    from sdbc_tpu.models import clip as clip_mod
    from sdbc_tpu.models.clip import CLIPVisionConfig
    from sdbc_tpu.ops import nn

    vcfg = CLIPVisionConfig.tiny()
    tcfg = dataclasses.replace(tiny_cfg.clip, projection_dim=16)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    params = {
        "text": clip_mod.init(k1, tcfg),
        "vision": clip_mod.vision_init(k2, vcfg),
        "visual_projection": nn.init_linear(k3, vcfg.hidden, 16,
                                            use_bias=False),
    }
    tok = CLIPTokenizer.fallback(tcfg.vocab_size)
    sc = ClipScorer(params, tcfg, vcfg, tok)
    imgs = np.random.default_rng(1).random((2, 40, 40, 3)).astype(np.float32)
    cos = sc.cosines(imgs, ["a red cover", "a blue cover"])
    score = sc.score(imgs, ["a red cover", "a blue cover"])
    assert cos.shape == score.shape == (2,)
    np.testing.assert_allclose(score, 2.5 * np.maximum(cos, 0.0),
                               atol=1e-7)
    assert (np.abs(cos) <= 1.0 + 1e-6).all()

    with pytest.raises(ValueError, match="one prompt per image"):
        sc.cosines(imgs, ["just one"])
    # unprojected text tower rejected loudly
    with pytest.raises(ValueError, match="projected text tower"):
        ClipScorer({"text": clip_mod.init(jax.random.key(5),
                                          tiny_cfg.clip),
                    "vision": params["vision"],
                    "visual_projection": params["visual_projection"]},
                   tiny_cfg.clip, vcfg, tok)


def test_clip_score_cli(tmp_path):
    """The CLI scores a generated-images dir against df_test rows and
    writes the per-image CSV (random-init tiny model, plumbing)."""
    from PIL import Image

    import sdbc_tpu.cli.clip_score as cs
    from tests.data_fixtures import build_fake_dataset

    root = build_fake_dataset(str(tmp_path / "data"), n_train=2, n_test=3,
                              img_size=32)
    import pandas as pd

    df = pd.read_csv(f"{root}/df_test.csv", index_col=0)
    gen = tmp_path / "gen"
    gen.mkdir()
    rng = np.random.default_rng(0)
    for rid in list(df.index)[:2]:
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8).astype(np.uint8)).save(
            gen / f"{rid}.jpg")
    (gen / "unrelated.jpg").write_bytes(b"")  # non-row file ignored

    mean = cs.main(["--images_dir", str(gen), "--data_root", root,
                    "--batch_size", "2"])
    assert np.isfinite(mean)
    lines = open(gen / "clip_scores.csv").read().strip().splitlines()
    assert lines[0] == "file,prompt,clip_score"
    assert len(lines) == 3  # header + 2 scored images
