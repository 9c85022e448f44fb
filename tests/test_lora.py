"""LoRA adapter training (train/lora.py) — beyond the reference's full
fine-tuning (finetune_sd.py:374-399).

Covers: target selection and init invariants, exact merge math (2-D UNet
linears and CLIP's stacked (L,in,out) leaves), the merged-inside-the-loss
training path (adapters move, base stays byte-frozen), npz round-trip,
checkpoint integration (base + lora.npz saved, load merges by default),
and the finetune CLI end to end with --lora_rank.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.diffusion.pipeline import PipelineConfig
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.train import lora as L
from sdbc_tpu.train import trainer as T


@pytest.fixture(scope="module")
def base(tiny_cfg):
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    return {"text_encoder": clip.init(k1, tiny_cfg.clip),
            "unet": unet.init(k2, tiny_cfg.unet),
            "vae": vae.init(k3, tiny_cfg.vae)}


def test_init_targets_and_zero_delta(tiny_cfg, base):
    lora = L.init_lora(jax.random.key(1), base, rank=2,
                       components=("unet", "text_encoder"))
    # tiny UNet: 2 cross-attn transformers at level 0 (down/up) + mid = 3+
    # actually layers_per_block=1, cross_attn_blocks=(True, False):
    # down[0] 1 tfm, up[1] 2 tfms (reversed), mid 1 → 4 tfms × 2 attns × 4
    # projections = 32; CLIP stacked "layers.attn.{q,k,v,o}" = 4
    unet_keys = [k for k in lora if k.startswith("unet.")]
    clip_keys = [k for k in lora if k.startswith("text_encoder.")]
    assert len(unet_keys) == 32 and len(clip_keys) == 4
    # vae never adapted
    assert not any(k.startswith("vae.") for k in lora)
    # CLIP adapters broadcast over the stacked layer dim
    a = lora["text_encoder.layers.attn.q"]["a"]
    assert a.shape == (tiny_cfg.clip.layers, tiny_cfg.clip.hidden, 2)
    # b = 0 ⇒ merge at init is EXACTLY the base
    merged = L.apply_lora(base, lora, scale=4.0)
    for k in ("unet", "text_encoder", "vae"):
        jax.tree.map(lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)), merged[k], base[k])


def test_component_selection(base):
    only_te = L.init_lora(jax.random.key(1), base, rank=2,
                          components=("text_encoder",))
    assert all(k.startswith("text_encoder.") for k in only_te)
    # the VAE's mid-attention is targetable when explicitly selected
    # (trainable_keys never selects it, hence the vae-free default above)
    only_vae = L.init_lora(jax.random.key(1), base, rank=2,
                           components=("vae",))
    assert only_vae and all(k.startswith("vae.") for k in only_vae)
    with pytest.raises(ValueError, match="no LoRA targets"):
        L.init_lora(jax.random.key(1), base, rank=2, components=("nope",))


def test_merge_math_exact(base):
    """w + scale*(a@b) on both a flat 2-D UNet leaf and a stacked CLIP
    leaf, against hand-computed numpy."""
    lora = L.init_lora(jax.random.key(2), base, rank=3,
                       components=("unet", "text_encoder"))
    # give b nonzero values so the delta is real
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    scale = 1.7
    merged = L.apply_lora(base, lora, scale)

    k2d = "unet.mid.attn.attn1.q"
    ab = lora[k2d]
    w = np.asarray(base["unet"]["mid"]["attn"]["attn1"]["q"]["w"])
    want = w + scale * np.asarray(ab["a"]) @ np.asarray(ab["b"])
    np.testing.assert_allclose(
        np.asarray(merged["unet"]["mid"]["attn"]["attn1"]["q"]["w"]),
        want, atol=1e-6)

    k3d = "text_encoder.layers.attn.o"
    ab = lora[k3d]
    w = np.asarray(base["text_encoder"]["layers"]["attn"]["o"]["w"])
    want = w + scale * np.einsum("lir,lro->lio", np.asarray(ab["a"]),
                                 np.asarray(ab["b"]))
    np.testing.assert_allclose(
        np.asarray(merged["text_encoder"]["layers"]["attn"]["o"]["w"]),
        want, atol=1e-6)
    # bias untouched, base tree untouched
    np.testing.assert_array_equal(
        np.asarray(merged["unet"]["mid"]["attn"]["attn1"]["o"]["b"]),
        np.asarray(base["unet"]["mid"]["attn"]["attn1"]["o"]["b"]))


def test_unmatched_adapter_path_raises(base):
    with pytest.raises(ValueError, match="not found in params"):
        L.apply_lora(base, {"unet.nope.q": {
            "a": jnp.zeros((4, 2)), "b": jnp.zeros((2, 4))}}, 1.0)


def test_lora_train_step_moves_adapter_only(tiny_cfg, base):
    tcfg = T.TrainConfig(train_unet=True, train_text_encoder=True,
                         grad_accum=2, learning_rate=1e-3,
                         lora_rank=4, lora_alpha=8.0)
    state = T.init_train_state(base, tcfg, compute_dtype=jnp.float32,
                               key=jax.random.key(3))
    assert set(state.trainable) == {"lora"}
    assert set(state.frozen) == {"unet", "text_encoder", "vae"}
    step = T.make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    rs = np.random.RandomState(0)
    batch = {"pixel_values": np.clip(rs.randn(2, 1, 16, 16, 3), -1, 1)
             .astype(np.float32),
             "input_ids": np.ones((2, 1, tiny_cfg.clip.ctx), np.int32)}
    st, metrics = step(state, batch, jax.random.key(4))
    assert bool(metrics["finite"]) and np.isfinite(float(metrics["loss"]))
    # the adapter moved...
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        st.trainable["lora"], state.trainable["lora"])
    assert max(jax.tree.leaves(moved)) > 0
    # ...the base did not (frozen is the same object tree)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), st.frozen, state.frozen)
    # merged weights reflect the adapter
    m0 = T.merged_params(state, tcfg)
    m1 = T.merged_params(st, tcfg)
    w_key = lambda m: np.asarray(m["unet"]["mid"]["attn"]["attn1"]["q"]["w"])
    assert not np.array_equal(w_key(m0), w_key(m1))
    # merged_params without the config refuses (silent base-serving guard)
    with pytest.raises(ValueError, match="needs the TrainConfig"):
        T.merged_params(st)


def test_npz_roundtrip_and_merge_file(base, tmp_path):
    lora = L.init_lora(jax.random.key(5), base, rank=2,
                       components=("unet",))
    lora = jax.tree.map(lambda x: x + 0.02, lora)
    p = str(tmp_path / "ad.npz")
    L.save_lora(p, lora, rank=2, alpha=16.0)
    back, meta = L.load_lora(p)
    assert meta["rank"] == 2 and meta["alpha"] == 16.0
    assert sorted(back) == sorted(lora)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=0), lora, back)
    # merge_file uses alpha/rank from the file
    m_file = L.merge_file(base, p)
    m_hand = L.apply_lora(base, lora, 16.0 / 2)
    np.testing.assert_allclose(
        np.asarray(m_file["unet"]["mid"]["attn"]["attn1"]["q"]["w"]),
        np.asarray(m_hand["unet"]["mid"]["attn"]["attn1"]["q"]["w"]),
        atol=1e-6)


def test_checkpoint_saves_base_plus_adapter(tiny_cfg, base, tmp_path):
    from sdbc_tpu.utils import checkpoint as ckpt_mod

    lora = L.init_lora(jax.random.key(6), base, rank=2,
                       components=("text_encoder",))
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    path = str(tmp_path / "ck")
    ckpt_mod.save_pipeline(path, base, tiny_cfg, lora=lora, lora_rank=2,
                           lora_alpha=4.0)
    assert os.path.exists(os.path.join(path, "lora.npz"))
    # default load = merged (tuned model for every consumer)
    merged, cfg = ckpt_mod.load_pipeline(path)
    want = L.apply_lora(base, lora, 4.0 / 2)
    np.testing.assert_allclose(
        np.asarray(merged["text_encoder"]["layers"]["attn"]["q"]["w"]),
        np.asarray(want["text_encoder"]["layers"]["attn"]["q"]["w"]),
        atol=1e-6)
    # merge_lora=False = raw base (the LoRA-resume path)
    raw, _ = ckpt_mod.load_pipeline(path, merge_lora=False)
    np.testing.assert_array_equal(
        np.asarray(raw["text_encoder"]["layers"]["attn"]["q"]["w"]),
        np.asarray(base["text_encoder"]["layers"]["attn"]["q"]["w"]))


def test_finetune_cli_lora_end_to_end(tmp_path):
    """--lora_rank through the real CLI: trains, checkpoints base +
    lora.npz, resumes, and the inference CLI serves the merged model."""
    import sdbc_tpu.cli.finetune as ft
    import sdbc_tpu.cli.inference as inf
    from tests.data_fixtures import build_fake_dataset

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    build_fake_dataset(root, n_train=8, n_test=2, img_size=32)
    argv = ["--tiny", "--data_root", root, "--img_size", "32",
            "--epochs", "1", "--batch_size", "1", "--grad_acc_steps", "1",
            "--num_examples", "8", "--train_text_encoder", "--train_unet",
            "--no-grad_ckpt", "--learning_rate", "1e-4", "--no-bf16",
            "--output_dir", out, "--run_id", "loratest",
            "--ckpts_per_epoch", "1", "--lora_rank", "2",
            "--lora_alpha", "4.0"]
    ft.main(argv)
    run_dir = os.path.join(out, "runs", "loratest")
    ckpts = [d for d in os.listdir(run_dir) if d.startswith("ckpt-")]
    assert ckpts
    latest = os.path.join(run_dir, max(ckpts,
                                       key=lambda d: int(d.split("-")[1])))
    assert os.path.exists(os.path.join(latest, "lora.npz"))
    # resume continues (restores adapter + opt state without error)
    ft.main(argv + ["--resume", "--epochs", "2"])
    # the inference CLI serves the merged checkpoint
    inf.main(["--mode", "enter_prompt", "--prompt", "a lora cover",
              "--tiny", "--ckpt", latest, "--img_size", "32",
              "--num_inference_steps", "2", "--no-bf16",
              "--save_dir", out + "/gen", "--run_id", "loratest"])
    outdir = os.path.join(out, "gen", "loratest inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))
    # rank-mismatch resume is refused loudly
    argv_r3 = list(argv)
    argv_r3[argv_r3.index("--lora_rank") + 1] = "3"
    with pytest.raises(SystemExit, match="rank"):
        ft.main(argv_r3 + ["--resume"])


def test_lora_dp_step_matches_single_device(tiny_cfg, base):
    """LoRA under DP-8: the psum'd adapter gradients drive the identical
    update as single-device (adapters replicate over the mesh)."""
    from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh, replicate_tree

    tcfg = T.TrainConfig(train_unet=True, train_text_encoder=True,
                         grad_accum=1, learning_rate=1e-4, num_examples=100,
                         lora_rank=2, lora_alpha=4.0)
    batch = {
        "pixel_values": jax.random.normal(jax.random.key(0),
                                          (1, 8, 32, 32, 3)),
        "input_ids": jnp.ones((1, 8, tiny_cfg.clip.ctx), jnp.int32),
    }
    key = jax.random.key(5)
    ikey = jax.random.key(6)

    s_single = T.init_train_state(base, tcfg, compute_dtype=jnp.float32,
                                  key=ikey)
    step_single = T.make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    s1, m1 = step_single(s_single, batch, key)

    mesh = make_mesh(MeshConfig(data=8))
    s_dp = T.init_train_state(base, tcfg, compute_dtype=jnp.float32, key=ikey)
    s_dp = replicate_tree(s_dp, mesh)
    step_dp = T.make_train_step(tiny_cfg, tcfg, mesh=mesh, dp_size=8,
                                compute_dtype=jnp.float32)
    s2, m2 = step_dp(s_dp, batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        s1.trainable["lora"], s2.trainable["lora"])
