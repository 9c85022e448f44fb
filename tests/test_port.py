"""Weight-port tests.

The gold test: our CLIP text encoder must match ``transformers.CLIPTextModel``
numerically when loaded with the same weights (the text encoder is the
reference's main fine-tune target, finetune_sd.py:375-379).  transformers is
baked into the image, so this is true cross-implementation parity, not a
self-roundtrip.  UNet/VAE (diffusers is NOT installed here) are covered by
export→port roundtrip + forward equality.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.models import clip, port, unet, vae


def test_clip_parity_with_transformers(tiny_cfg):
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    c = tiny_cfg.clip
    hf_cfg = HFConfig(
        vocab_size=c.vocab_size, hidden_size=c.hidden,
        intermediate_size=c.mlp, num_hidden_layers=c.layers,
        num_attention_heads=c.heads, max_position_embeddings=c.ctx,
        hidden_act="quick_gelu", layer_norm_eps=c.eps)
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = port.port_clip_text(sd)

    ids = np.array([[1, 5, 9, 2] + [0] * (c.ctx - 4)], np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(clip.apply(params, jnp.asarray(ids, jnp.int32), c))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_unet_export_port_roundtrip(tiny_cfg, tiny_params):
    cfg = tiny_cfg.unet
    sd = port.export_unet(tiny_params["unet"])
    back = port.port_unet(sd)
    lat = jax.random.normal(jax.random.key(0), (1, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(1), (1, 16, cfg.cross_attention_dim))
    t = jnp.array([42])
    a = unet.apply(tiny_params["unet"], lat, t, ctx, cfg)
    b = unet.apply(back, lat, t, ctx, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_vae_export_port_roundtrip(tiny_cfg, tiny_params):
    cfg = tiny_cfg.vae
    sd = port.export_vae(tiny_params["vae"])
    back = port.port_vae(sd)
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 3))
    m1, _ = vae.encode_moments(tiny_params["vae"], x, cfg)
    m2, _ = vae.encode_moments(back, x, cfg)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)


def test_clip_export_port_roundtrip(tiny_cfg, tiny_params):
    c = tiny_cfg.clip
    sd = port.export_clip_text(tiny_params["text_encoder"])
    back = port.port_clip_text(sd)
    ids = jnp.ones((1, c.ctx), jnp.int32)
    a = clip.apply(tiny_params["text_encoder"], ids, c)
    b = clip.apply(back, ids, c)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
