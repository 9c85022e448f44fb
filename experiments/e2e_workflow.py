"""End-to-end workflow proof on the real TPU chip (VERDICT r3 item 2).

Runs the reference's ACTUAL loop — finetune → checkpoint → fixed-seed
grids → get_fid_images → FID vs freshly precalc'd stats
(/root/reference/README.md:7-18, inference.py:442-454) — as ONE command
against a synthetic Goodreads-layout dataset, at full SD-1.5 shapes but
small counts, and writes the manifest (losses, FID, timings) to
experiments/E2E_R4.md.

    python experiments/e2e_workflow.py                  # TPU, SD-1.5 shapes
    SDBC_E2E_TINY=1 python experiments/e2e_workflow.py  # CPU smoke

Zero-egress notes: weights are random-init (no pretrained checkpoints can
enter this image), so the absolute FID value is meaningless as a quality
claim — what this artifact certifies is the INTEGRATION: every stage of
the reference workflow executing end-to-end on the chip, a falling loss
curve, a checkpoint that round-trips, and a finite FID computed by the
full stack (generation → InceptionV3 pool3 → Fréchet).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = os.environ.get("SDBC_E2E_TINY", "") == "1"
if TINY:
    import jax

    jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import numpy as np

    from tests.data_fixtures import build_fake_dataset

    work = os.environ.get("SDBC_E2E_DIR", "/tmp/sdbc_e2e")
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "data")
    out = os.path.join(work, "out")
    run_id = "e2e_r4"

    if TINY:
        img_size, steps_infer, n_train, n_test = 32, 2, 8, 4
        n_fid, epochs, grad_acc, scheduler = 4, 1, 2, "ddim"
        extra_train = ["--tiny", "--no-bf16"]
        extra_common = ["--tiny", "--no-bf16"]
        extra_stats = ["--tiny"]  # precalc CLI has no bf16 flag
    else:
        img_size, steps_infer, n_train, n_test = 512, 25, 96, 32
        n_fid, epochs, grad_acc, scheduler = 32, 2, 4, "dpm"
        # 8-bit Adam on the chip, like the reference's default engine
        # (bitsandbytes AdamW8bit): fp32 Adam moments for UNet+text-encoder
        # masters don't fit 16 GB HBM next to the remat'd step
        extra_train = ["--use_8bit_adam"]
        extra_common = []
        extra_stats = []

    stages = []

    def stage(name, fn):
        print(f"[e2e] {name}...", flush=True)
        t0 = time.monotonic()
        ret = fn()
        dt = time.monotonic() - t0
        stages.append((name, dt))
        print(f"[e2e] {name}: done in {dt:.1f}s", flush=True)
        return ret

    # 1) dataset (the preprocessing notebook's OUTPUT layout — integrity
    #    checks and split live in cli/preprocess.py, tested separately)
    if not os.path.exists(os.path.join(root, "df_train.csv")):
        stage("dataset", lambda: build_fake_dataset(
            root, n_train=n_train, n_test=n_test, img_size=img_size))

    # 2) finetune: UNet + text encoder (lr up from the reference's 5e-6 —
    #    random-init weights need a visible loss slope in few steps)
    def run_train():
        import sdbc_tpu.cli.finetune as ft

        ft.main(["--data_root", root, "--output_dir", out,
                 "--run_id", run_id, "--img_size", str(img_size),
                 "--num_examples", str(n_train), "--epochs", str(epochs),
                 "--batch_size", "1", "--grad_acc_steps", str(grad_acc),
                 "--learning_rate", "1e-4", "--train_unet",
                 "--train_text_encoder", "--num_workers", "2",
                 "--ckpts_per_epoch", "1"] + extra_train)

    stage("finetune", run_train)

    from sdbc_tpu.utils import checkpoint as ckpt_mod

    ckpt = ckpt_mod.latest_checkpoint(out, run_id)
    assert ckpt, f"no checkpoint written under {out}/runs/{run_id}"

    # loss curve from the run's events.jsonl
    events_path = os.path.join(out, "runs", run_id, "events.jsonl")
    losses = [json.loads(l)["loss"] for l in open(events_path)
              if "loss" in json.loads(l)]
    first_q = float(np.mean(losses[:max(1, len(losses) // 4)]))
    last_q = float(np.mean(losses[-max(1, len(losses) // 4):]))

    # 3) fixed-seed qualitative grids (the reference's default mode)
    def run_grids():
        import sdbc_tpu.cli.inference as inf

        inf.main(["--mode", "default", "--ckpt", ckpt,
                  "--data_root", root, "--img_size", str(img_size),
                  "--num_inference_steps", str(steps_infer),
                  "--scheduler", scheduler,
                  "--batch_size", "2", "--samples_per_prompt", "2",
                  "--save_dir", os.path.join(out, "grids"),
                  "--run_id", run_id] + extra_common)

    stage("grids", run_grids)

    # 4) FID stats over the real (synthetic-real) test images
    stats = os.path.join(out, "fid_stats.npz")

    def run_stats():
        import sdbc_tpu.cli.precalc_fid_stats as pf

        pf.main(["--data_root", root, "--img_size", str(img_size),
                 "--num_imgs", str(n_test), "--batch_size", "8",
                 "--out", stats] + extra_stats)

    stage("precalc_fid_stats", run_stats)

    # 5) generate FID covers + score
    def run_fid():
        import sdbc_tpu.cli.inference as inf

        inf.main(["--mode", "calc_fid", "--ckpt", ckpt,
                  "--data_root", root, "--img_size", str(img_size),
                  "--num_inference_steps", str(steps_infer),
                  "--scheduler", scheduler,
                  "--num_imgs", str(n_fid), "--batch_size", "4",
                  "--save_dir", os.path.join(out, "fidgen"),
                  "--fid_stats_path", stats,
                  "--run_id", run_id] + extra_common)

    stage("calc_fid", run_fid)

    score_file = os.path.join(out, "fidgen", f"{run_id} inference",
                              "fid_score.txt")
    fid = float(open(score_file).read().strip())
    assert np.isfinite(fid), f"non-finite FID {fid}"

    import jax

    backend = jax.default_backend()
    total = sum(dt for _, dt in stages)
    manifest = [
        "# E2E_R4 — end-to-end workflow proof "
        f"({'CPU tiny smoke' if TINY else 'TPU, SD-1.5 shapes'})",
        "",
        "The reference's full loop (README.md:7-18: finetune → checkpoint →",
        "grids → get_fid_images → FID) executed as ONE command",
        "(`experiments/e2e_workflow.py`) on backend "
        f"`{backend}`, {time.strftime('%Y-%m-%d %H:%M')}.",
        "",
        f"- dataset: {n_train} train / {n_test} test synthetic Goodreads "
        f"covers @ {img_size}px (zero-egress image: no real dataset, no "
        "pretrained weights — this artifact certifies the INTEGRATION, "
        "not absolute quality)",
        f"- finetune: UNet+text-encoder, {epochs} epochs x {n_train} "
        f"examples, grad-acc {grad_acc}, lr 1e-4, bf16"
        f"{' (fp32 tiny)' if TINY else ''}",
        f"- loss: first-quartile mean **{first_q:.4f}** → last-quartile "
        f"mean **{last_q:.4f}** over {len(losses)} logged steps "
        f"({'falling' if last_q < first_q else 'NOT falling'})",
        f"- checkpoint: `{ckpt}` (round-tripped by stages 3-5)",
        f"- grids: fixed-seed prompt grids via inference --mode default "
        f"({scheduler}-{steps_infer})",
        f"- FID: **{fid:.3f}** over {n_fid} generated covers vs "
        f"{n_test}-image stats (random-init Inception port — finite & "
        "reproducible, not comparable to published FIDs)",
        "",
        "| stage | seconds |",
        "|---|---|",
    ]
    manifest += [f"| {n} | {dt:.1f} |" for n, dt in stages]
    manifest += [f"| **total** | **{total:.1f}** |", ""]
    dst = os.path.join(HERE, "E2E_R4.md")
    with open(dst, "w") as f:
        f.write("\n".join(manifest))
    print(f"[e2e] wrote {dst}; FID={fid:.3f} loss {first_q:.4f}->"
          f"{last_q:.4f} total {total:.1f}s", flush=True)
    assert last_q < first_q, "loss did not fall — see events.jsonl"


if __name__ == "__main__":
    main()
