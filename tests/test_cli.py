"""End-to-end CLI tests on a synthetic Goodreads dataset (tiny configs)."""
import json
import os

import numpy as np
import pytest

from tests.data_fixtures import build_fake_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clids"))
    out = str(tmp_path_factory.mktemp("cliout"))
    build_fake_dataset(root, n_train=8, n_test=4, img_size=32)
    return {"root": root, "out": out}


@pytest.fixture(scope="module")
def trained_ckpt(env):
    import sdbc_tpu.cli.finetune as ft

    ft.main(["--tiny", "--data_root", env["root"], "--img_size", "32",
             "--epochs", "2", "--batch_size", "1", "--grad_acc_steps", "1",
             "--num_examples", "8", "--train_text_encoder",
             "--learning_rate", "1e-4", "--no-bf16",
             "--output_dir", env["out"], "--run_id", "clitest",
             "--ckpts_per_epoch", "2"])
    run_dir = os.path.join(env["out"], "runs", "clitest")
    ckpts = [d for d in os.listdir(run_dir) if d.startswith("ckpt-")]
    assert ckpts, "no checkpoint saved"
    # local JSONL tracking always on (wandb absent)
    assert os.path.exists(os.path.join(run_dir, "events.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "hyperparams.json"))
    latest = max(ckpts, key=lambda d: int(d.split("-")[1]))
    return os.path.join(run_dir, latest)


def test_finetune_then_enter_prompt(env, trained_ckpt):
    import sdbc_tpu.cli.inference as inf

    inf.main(["--mode", "enter_prompt", "--prompt", "a test cover",
              "--tiny", "--ckpt", trained_ckpt, "--img_size", "32",
              "--num_inference_steps", "2", "--no-bf16",
              "--save_dir", env["out"] + "/gen", "--run_id", "clitest"])
    outdir = os.path.join(env["out"], "gen", "clitest inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))


def test_precalc_and_calc_fid(env, trained_ckpt):
    import sdbc_tpu.cli.inference as inf
    import sdbc_tpu.cli.precalc_fid_stats as pf

    stats = os.path.join(env["out"], "fid_stats.npz")
    pf.main(["--data_root", env["root"], "--img_size", "32",
             "--batch_size", "4", "--out", stats, "--tiny"])
    with np.load(stats) as f:
        assert f["mu"].ndim == 1 and f["sigma"].ndim == 2

    inf.main(["--mode", "calc_fid", "--tiny", "--ckpt", trained_ckpt,
              "--data_root", env["root"], "--img_size", "32",
              "--num_inference_steps", "2", "--num_imgs", "4",
              "--batch_size", "2", "--save_dir", env["out"] + "/fidgen",
              "--fid_stats_path", stats, "--no-bf16", "--run_id", "clitest"])
    gen_dir = os.path.join(env["out"], "fidgen", "clitest inference")
    score_file = os.path.join(gen_dir, "fid_score.txt")
    assert os.path.exists(score_file)
    fid = float(open(score_file).read().strip())
    assert np.isfinite(fid)
    # resume-awareness: re-run generates nothing new but still scores
    n_before = len(os.listdir(gen_dir))
    inf.main(["--mode", "calc_fid", "--tiny", "--ckpt", trained_ckpt,
              "--data_root", env["root"], "--img_size", "32",
              "--num_inference_steps", "2", "--num_imgs", "4",
              "--batch_size", "2", "--save_dir", env["out"] + "/fidgen",
              "--fid_stats_path", stats, "--no-bf16", "--run_id", "clitest"])
    assert len(os.listdir(gen_dir)) == n_before


def test_default_mode_grid(env, trained_ckpt):
    import sdbc_tpu.cli.inference as inf

    inf.main(["--mode", "default", "--tiny", "--ckpt", trained_ckpt,
              "--img_size", "32", "--num_inference_steps", "2",
              "--batch_size", "4", "--samples_per_prompt", "1",
              "--data_root", env["root"],
              "--save_dir", env["out"] + "/grids", "--no-bf16",
              "--run_id", "clitest"])
    outdir = os.path.join(env["out"], "grids", "clitest inference")
    # reference default mode renders the full config matrix
    # (inference.py:458-471); summarize is skipped (no --bart_ckpt)
    assert os.path.exists(os.path.join(
        outdir, "summerize=False,include_desc=False.png"))
    assert os.path.exists(os.path.join(
        outdir, "summerize=False,include_desc=True.png"))
    assert not os.path.exists(os.path.join(
        outdir, "summerize=True,include_desc=True.png"))
    assert os.path.exists(os.path.join(outdir, "hyperparams.json"))


def test_default_mode_single_grid_without_dataset(env, trained_ckpt, tmp_path):
    """No df_test.csv → desc/summarize configs skip gracefully."""
    import sdbc_tpu.cli.inference as inf

    inf.main(["--mode", "default", "--tiny", "--ckpt", trained_ckpt,
              "--img_size", "32", "--num_inference_steps", "2",
              "--batch_size", "4", "--samples_per_prompt", "1",
              "--data_root", str(tmp_path),
              "--save_dir", env["out"] + "/grids2", "--no-bf16",
              "--run_id", "clitest"])
    outdir = os.path.join(env["out"], "grids2", "clitest inference")
    pngs = [f for f in os.listdir(outdir) if f.endswith(".png")]
    assert pngs == ["summerize=False,include_desc=False.png"]


def test_resume_training(env, trained_ckpt):
    import sdbc_tpu.cli.finetune as ft

    ft.main(["--tiny", "--data_root", env["root"], "--img_size", "32",
             "--epochs", "2", "--batch_size", "1", "--grad_acc_steps", "1",
             "--num_examples", "8", "--train_text_encoder",
             "--learning_rate", "1e-4", "--no-bf16",
             "--output_dir", env["out"], "--run_id", "clitest", "--resume"])
    run_dir = os.path.join(env["out"], "runs", "clitest")
    assert len([d for d in os.listdir(run_dir)
                if d.startswith("ckpt-")]) >= 2


def test_resume_continues_schedule_not_doubles(env):
    """--resume completes the ORIGINAL epoch budget: 1 epoch trained +
    resume with --epochs 2 => exactly one more epoch (2*S steps total),
    not 1+2 epochs."""
    import jax

    import sdbc_tpu.cli.finetune as ft

    base = ["--tiny", "--data_root", env["root"], "--img_size", "32",
            "--batch_size", "1", "--grad_acc_steps", "1",
            "--num_examples", "8", "--train_text_encoder", "--no-bf16",
            "--output_dir", env["out"], "--run_id", "sched"]
    ft.main(base + ["--epochs", "1"])
    run_dir = os.path.join(env["out"], "runs", "sched")

    def final_step():
        latest = max((d for d in os.listdir(run_dir) if d.startswith("ckpt-")),
                     key=lambda d: int(d.split("-")[1]))
        with open(os.path.join(run_dir, latest, "metadata.json")) as f:
            return int(json.load(f)["step"])

    s1 = final_step()
    # steps/epoch = 8 examples / (batch 1 x dp devices x acc 1)
    assert s1 == 8 // jax.device_count()
    ft.main(base + ["--epochs", "2", "--resume"])
    assert final_step() == 2 * s1  # one ADDITIONAL epoch, not two more


def test_tp_fsdp_train_checkpoint_resume(env):
    """Sharded training is durable end-to-end: TP2+FSDP train -> orbax
    checkpoint of the sharded state -> --resume continues on the mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sdbc_tpu.cli.finetune as ft

    argv = ["--tiny", "--data_root", env["root"], "--img_size", "32",
            "--epochs", "1", "--batch_size", "1", "--grad_acc_steps", "1",
            "--num_examples", "8", "--train_text_encoder", "--no-bf16",
            "--tp", "2", "--fsdp",
            "--output_dir", env["out"], "--run_id", "tpresume"]
    ft.main(argv)
    run_dir = os.path.join(env["out"], "runs", "tpresume")
    first = len([d for d in os.listdir(run_dir) if d.startswith("ckpt-")])
    assert first >= 1
    ft.main(argv + ["--resume", "--epochs", "2"])
    assert len([d for d in os.listdir(run_dir)
                if d.startswith("ckpt-")]) > first


def test_preprocess_cli(tmp_path):
    import sdbc_tpu.cli.preprocess as pp

    root = build_fake_dataset(str(tmp_path), n_train=6, n_test=3,
                              img_size=32, with_source=True)
    pp.main(["--data_root", root, "--n_test", "3"])
    assert os.path.exists(os.path.join(root, "df_train.csv"))
    assert os.path.exists(os.path.join(root, "df_test.csv"))


def test_enter_prompt_serving_profile(env, trained_ckpt):
    """The recommended fast serving profile composes through the CLI:
    --scheduler dpm --cache_interval 2 --cache_tail 1."""
    import sdbc_tpu.cli.inference as inf

    inf.main(["--mode", "enter_prompt", "--prompt", "a fast cover",
              "--tiny", "--ckpt", trained_ckpt, "--img_size", "32",
              "--num_inference_steps", "4", "--no-bf16",
              "--scheduler", "dpm", "--cache_interval", "2",
              "--cache_tail", "1",
              "--save_dir", env["out"] + "/gen", "--run_id", "servetest"])
    outdir = os.path.join(env["out"], "gen", "servetest inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))


def test_grad_ckpt_tristate_parser():
    """--grad_ckpt default is None (forced on with --train_unet in main);
    an explicit --no-grad_ckpt must survive parsing to override the force."""
    from sdbc_tpu.cli.finetune import build_parser

    p = build_parser()
    assert p.parse_args([]).grad_ckpt is None
    assert p.parse_args(["--grad_ckpt"]).grad_ckpt is True
    assert p.parse_args(["--no-grad_ckpt"]).grad_ckpt is False
    a = p.parse_args(["--train_unet", "--no-grad_ckpt"])
    assert a.train_unet and a.grad_ckpt is False
    assert p.parse_args(["--remat_mode", "selective"]).remat_mode == "selective"


def test_img_size_defaults_against_tiny():
    """--tiny without --img_size must resolve to 32: the tiny VAE only
    downsamples 2x, so the full 512 default would build a 256x256-latent
    attention graph (hundreds of GB)."""
    from sdbc_tpu.cli import common
    from sdbc_tpu.cli.finetune import build_parser

    p = build_parser()
    for argv, want in ([], 512), (["--tiny"], 32), \
                      (["--tiny", "--img_size", "64"], 64):
        a = p.parse_args(argv)
        common.resolve_img_size(a)
        assert a.img_size == want, (argv, a.img_size)


def test_tp_fsdp_parser():
    from sdbc_tpu.cli.finetune import build_parser

    p = build_parser()
    a = p.parse_args(["--tp", "2", "--fsdp"])
    assert a.tp == 2 and a.fsdp is True
    d = p.parse_args([])
    assert d.tp == 1 and d.fsdp is False


def test_spatial_requires_tp():
    """--spatial without --tp must exit loudly (no mesh to shard rows over)."""
    import sdbc_tpu.cli.inference as inf

    with pytest.raises(SystemExit, match="--spatial requires --tp"):
        inf.main(["--mode", "enter_prompt", "--prompt", "x", "--tiny",
                  "--spatial"])


def test_summarize_forced_errors_without_inputs(tmp_path):
    """Explicit --summarize FORCES the config: missing df_test.csv or a
    contradictory --no-include_desc must error, not silently skip
    (tri-state contract in cli/inference.py)."""
    from sdbc_tpu.cli import inference

    base = ["--mode", "default", "--tiny", "--bart_ckpt", "/nonexistent",
            "--data_root", str(tmp_path), "--save_dir",
            str(tmp_path / "out"), "--run_id", "x", "--img_size", "32",
            "--num_inference_steps", "1"]
    with pytest.raises(SystemExit, match="df_test.csv"):
        inference.main(base + ["--summarize"])
    with pytest.raises(SystemExit, match="include_desc"):
        inference.main(base + ["--summarize", "--no-include_desc"])


def test_sharded_state_rejects_8bit_adam(tmp_path):
    """--use_8bit_adam + --fsdp/--tp must error up front: the fused int8
    Pallas update kernel cannot be partitioned over sharded state."""
    from sdbc_tpu.cli import finetune

    for extra in (["--fsdp"], ["--tp", "2"]):
        with pytest.raises(SystemExit, match="8bit"):
            finetune.main(["--tiny", "--data_root", str(tmp_path),
                           "--use_8bit_adam"] + extra)


def test_enter_prompt_img2img_and_inpaint(env, trained_ckpt, tmp_path):
    """--init_image switches enter_prompt to img2img; adding --mask_image
    inpaints (the diffusers Img2Img/Inpaint surface through the CLI)."""
    from PIL import Image

    import sdbc_tpu.cli.inference as inf

    init = str(tmp_path / "init.png")
    Image.fromarray(
        (np.random.RandomState(3).rand(32, 32, 3) * 255).astype(np.uint8)
    ).save(init)
    mask = str(tmp_path / "mask.png")
    m = np.zeros((32, 32), np.uint8)
    m[8:24, 8:24] = 255
    Image.fromarray(m).save(mask)

    base = ["--mode", "enter_prompt", "--prompt", "a remixed cover",
            "--tiny", "--ckpt", trained_ckpt, "--img_size", "32",
            "--num_inference_steps", "3", "--no-bf16",
            "--save_dir", env["out"] + "/gen"]
    inf.main(base + ["--init_image", init, "--strength", "0.7",
                     "--run_id", "i2itest"])
    outdir = os.path.join(env["out"], "gen", "i2itest inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))

    inf.main(base + ["--init_image", init, "--mask_image", mask,
                     "--run_id", "inpainttest"])
    outdir = os.path.join(env["out"], "gen", "inpainttest inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))

    with pytest.raises(SystemExit, match="requires --init_image"):
        inf.main(base + ["--mask_image", mask, "--run_id", "badmask"])
    with pytest.raises(SystemExit, match="not found"):
        inf.main(base + ["--init_image", str(tmp_path / "missing.png"),
                         "--run_id", "badinit"])


def _write_controlnet_dir(tmp_path, cn_cfg, unet_params):
    """Materialize a diffusers-layout ControlNetModel dir for --controlnet_path."""
    import jax

    from safetensors.numpy import save_file

    from sdbc_tpu.models import controlnet, port

    cn = controlnet.from_unet(unet_params, jax.random.key(9), cn_cfg)
    d = tmp_path / "cn"
    d.mkdir()
    save_file(port.export_controlnet(cn), str(d / "model.safetensors"))
    u = cn_cfg.unet
    (d / "config.json").write_text(json.dumps({
        "in_channels": u.in_channels,
        "block_out_channels": list(u.block_out_channels),
        "layers_per_block": u.layers_per_block,
        "cross_attention_dim": u.cross_attention_dim,
        "attention_head_dim": u.attention_heads,
        "norm_num_groups": u.norm_groups,
        "down_block_types": ["CrossAttnDownBlock2D" if c else "DownBlock2D"
                             for c in u.cross_attn_blocks],
        "conditioning_embedding_out_channels":
            list(cn_cfg.conditioning_channels),
    }))
    return str(d)


def test_enter_prompt_controlnet(env, trained_ckpt, tmp_path):
    """--controlnet_path attaches a ported diffusers ControlNet and
    --control_image routes a conditioning image through it."""
    from PIL import Image

    import sdbc_tpu.cli.inference as inf
    from sdbc_tpu.models.controlnet import ControlNetConfig
    from sdbc_tpu.utils import checkpoint as ckpt_mod

    params, _ = ckpt_mod.load_pipeline(trained_ckpt)
    cn_dir = _write_controlnet_dir(tmp_path, ControlNetConfig.tiny(),
                                   params["unet"])
    ctrl = str(tmp_path / "edges.png")
    Image.fromarray(
        (np.random.RandomState(5).rand(32, 32, 3) * 255).astype(np.uint8)
    ).save(ctrl)

    base = ["--mode", "enter_prompt", "--prompt", "a controlled cover",
            "--tiny", "--ckpt", trained_ckpt, "--img_size", "32",
            "--num_inference_steps", "3", "--no-bf16",
            "--save_dir", env["out"] + "/gen"]
    inf.main(base + ["--controlnet_path", cn_dir, "--control_image", ctrl,
                     "--controlnet_scale", "0.8", "--run_id", "cntest"])
    outdir = os.path.join(env["out"], "gen", "cntest inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))

    with pytest.raises(SystemExit, match="needs a ControlNet"):
        inf.main(base + ["--control_image", ctrl, "--run_id", "badcn"])


def test_controlnet_layout_mismatch_rejected(env, trained_ckpt, tmp_path):
    """A ControlNet whose encoder layout disagrees with the base UNet is
    refused at load (the residual shapes could not line up)."""
    import dataclasses

    import jax

    import sdbc_tpu.cli.inference as inf
    from sdbc_tpu.models import unet
    from sdbc_tpu.models.controlnet import ControlNetConfig

    bad_u = dataclasses.replace(unet.UNetConfig.tiny(),
                                block_out_channels=(16, 32), norm_groups=4)
    bad_cfg = ControlNetConfig(unet=bad_u, conditioning_channels=(8, 16))
    cn_dir = _write_controlnet_dir(tmp_path, bad_cfg,
                                   unet.init(jax.random.key(0), bad_u))
    with pytest.raises(SystemExit, match="does not match"):
        inf.main(["--mode", "enter_prompt", "--prompt", "x", "--tiny",
                  "--ckpt", trained_ckpt, "--img_size", "32",
                  "--num_inference_steps", "2", "--no-bf16",
                  "--controlnet_path", cn_dir,
                  "--save_dir", env["out"] + "/gen", "--run_id", "mismatch"])


def test_finetune_controlnet_then_serve(env, tmp_path):
    """--train_controlnet end-to-end: the run clones a branch from the base
    UNet, trains only it, checkpoints it as a component, and the checkpoint
    serves --control_image directly (no --controlnet_path needed)."""
    from PIL import Image

    import sdbc_tpu.cli.finetune as ft
    import sdbc_tpu.cli.inference as inf

    ft.main(["--tiny", "--data_root", env["root"], "--img_size", "32",
             "--epochs", "1", "--batch_size", "1", "--grad_acc_steps", "1",
             "--num_examples", "8", "--train_controlnet",
             "--control_hint", "edges",
             "--learning_rate", "1e-4", "--no-bf16",
             "--output_dir", env["out"], "--run_id", "cntrain",
             "--ckpts_per_epoch", "1"])
    run_dir = os.path.join(env["out"], "runs", "cntrain")
    ckpts = [d for d in os.listdir(run_dir) if d.startswith("ckpt-")]
    assert ckpts, "no checkpoint saved"
    latest = os.path.join(
        run_dir, max(ckpts, key=lambda d: int(d.split("-")[1])))
    assert os.path.isdir(os.path.join(latest, "controlnet"))
    cfg_json = json.load(open(os.path.join(latest, "config.json")))
    assert "controlnet" in cfg_json

    ctrl = str(tmp_path / "hint.png")
    Image.fromarray(
        (np.random.RandomState(7).rand(32, 32, 3) * 255).astype(np.uint8)
    ).save(ctrl)
    inf.main(["--mode", "enter_prompt", "--prompt", "a trained control",
              "--tiny", "--ckpt", latest, "--img_size", "32",
              "--num_inference_steps", "2", "--no-bf16",
              "--control_image", ctrl,
              "--save_dir", env["out"] + "/gen", "--run_id", "cnserve"])
    outdir = os.path.join(env["out"], "gen", "cnserve inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))


def test_train_controlnet_flag_conflicts(env):
    import sdbc_tpu.cli.finetune as ft

    base = ["--tiny", "--data_root", env["root"], "--img_size", "32",
            "--epochs", "1", "--num_examples", "4", "--train_controlnet"]
    with pytest.raises(SystemExit, match="cannot combine"):
        ft.main(base + ["--lora_rank", "2"])
    with pytest.raises(SystemExit, match="cache_latents"):
        ft.main(base + ["--cache_latents"])
    with pytest.raises(SystemExit, match="drop\n?.*--train_unet"):
        ft.main(base + ["--train_unet"])


def test_enter_prompt_hires(env, trained_ckpt):
    """--hires_scale composes both stages through the CLI (latent mode)."""
    import sdbc_tpu.cli.inference as inf

    inf.main(["--mode", "enter_prompt", "--prompt", "a big cover",
              "--tiny", "--ckpt", trained_ckpt, "--img_size", "32",
              "--num_inference_steps", "2", "--no-bf16",
              "--hires_scale", "2.0", "--hires_strength", "0.6",
              "--hires_steps", "2",
              "--save_dir", env["out"] + "/gen", "--run_id", "hirestest"])
    outdir = os.path.join(env["out"], "gen", "hirestest inference")
    pngs = [f for f in os.listdir(outdir) if f.endswith(".png")]
    assert pngs
    from PIL import Image

    with Image.open(os.path.join(outdir, pngs[0])) as im:
        assert im.size == (32, 32)


def test_finetune_prior_preservation(env):
    """DreamBooth prior preservation composes end-to-end through the CLI:
    class set self-generated, every step trains instance + prior batches."""
    import sdbc_tpu.cli.finetune as ft

    ft.main(["--tiny", "--data_root", env["root"], "--img_size", "32",
             "--epochs", "1", "--batch_size", "1", "--grad_acc_steps", "1",
             "--num_examples", "8", "--train_text_encoder",
             "--learning_rate", "1e-4", "--no-bf16",
             "--prior_class_prompt", "a book cover",
             "--prior_generate", "2", "--prior_gen_steps", "2",
             "--prior_weight", "0.5",
             "--output_dir", env["out"], "--run_id", "priortest",
             "--ckpts_per_epoch", "1"])
    run_dir = os.path.join(env["out"], "runs", "priortest")
    assert any(d.startswith("ckpt-") for d in os.listdir(run_dir))
    class_dir = os.path.join(env["out"], "prior_class")
    pngs = [f for f in os.listdir(class_dir) if f.endswith(".png")]
    assert len(pngs) == 2
