"""CLIPScore CLI — score generated covers against their book prompts.

Beyond the reference's FID-only evaluation (/root/reference/fid.py):
CLIPScore (arXiv:2104.08718) measures per-image prompt alignment.  Scores
every ``<row-id>.jpg/png`` in --images_dir (the get_fid_images naming,
eval/generate.py) against its df_test row's canonical "TITLE by AUTHOR"
text, printing the mean and writing a per-image CSV next to the images.

    python -m sdbc_tpu.cli.clip_score --images_dir generated/ \
        --data_root dataset/ --clip_ckpt openai-clip-vit-base-patch32/

--clip_ckpt is a transformers CLIPModel save dir (both towers + the two
projections).  Without it a random-init tiny model runs the plumbing and
says so loudly (zero-egress image: no pretrained CLIP available here).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images_dir", type=str, required=True)
    p.add_argument("--data_root", type=str, default="./")
    p.add_argument("--csv_name", type=str, default="df_test.csv")
    p.add_argument("--clip_ckpt", type=str, default="",
                   help="transformers CLIPModel dir; empty = random-init "
                        "tiny model (plumbing only, meaningless scores)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--out_csv", type=str, default="",
                   help="per-image scores CSV (default "
                        "<images_dir>/clip_scores.csv)")
    return p


def main(argv=None):
    import jax

    import pandas as pd
    from PIL import Image

    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.eval.clip_score import ClipScorer
    from sdbc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    if args.clip_ckpt:
        from sdbc_tpu.models.port import clip_model_from_dir

        params, tcfg, vcfg = clip_model_from_dir(args.clip_ckpt)
        tok = (CLIPTokenizer.from_pretrained(args.clip_ckpt)
               if os.path.exists(os.path.join(args.clip_ckpt, "vocab.json"))
               else CLIPTokenizer.fallback(tcfg.vocab_size))
    else:
        import dataclasses

        from sdbc_tpu.models import clip as clip_mod
        from sdbc_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
        from sdbc_tpu.ops import nn

        print("WARNING: no --clip_ckpt — random-init tiny CLIP, scores "
              "are MEANINGLESS (plumbing/smoke only)", flush=True)
        tcfg = dataclasses.replace(CLIPTextConfig.tiny(), projection_dim=16)
        vcfg = CLIPVisionConfig.tiny()
        k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
        params = {"text": clip_mod.init(k1, tcfg),
                  "vision": clip_mod.vision_init(k2, vcfg),
                  "visual_projection": nn.init_linear(
                      k3, vcfg.hidden, 16, use_bias=False)}
        tok = CLIPTokenizer.fallback(tcfg.vocab_size)

    scorer = ClipScorer(params, tcfg, vcfg, tok)

    df = pd.read_csv(os.path.join(args.data_root, args.csv_name),
                     index_col=0)
    files = sorted(f for f in os.listdir(args.images_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    pairs = []
    for f in files:
        stem = os.path.splitext(f)[0]
        try:
            row = df.loc[int(stem)]
        except (ValueError, KeyError):
            continue
        pairs.append((f, f"{row['book_title']} by {row['book_authors']}"))
    if not pairs:
        raise SystemExit(f"no <row-id>.jpg images matching {args.csv_name} "
                         f"rows under {args.images_dir}")

    scores = []
    for i in range(0, len(pairs), args.batch_size):
        chunk = pairs[i:i + args.batch_size]
        imgs = np.stack([
            np.asarray(Image.open(os.path.join(args.images_dir, f))
                       .convert("RGB"), np.float32) / 255.0
            for f, _ in chunk])
        scores.extend(scorer.score(imgs, [t for _, t in chunk]).tolist())
        print(f"[clip_score] {min(i + args.batch_size, len(pairs))}"
              f"/{len(pairs)}", flush=True)

    out_csv = args.out_csv or os.path.join(args.images_dir,
                                           "clip_scores.csv")
    import csv

    # csv.writer, not hand-rolled quoting: real Goodreads titles contain
    # double quotes and commas, which would shift/malform rows
    with open(out_csv, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["file", "prompt", "clip_score"])
        for (f, t), s in zip(pairs, scores):
            w.writerow([f, t, f"{s:.6f}"])
    mean = float(np.mean(scores))
    print(f"CLIPScore mean over {len(scores)} images: {mean:.4f} "
          f"(per-image: {out_csv})")
    return mean


if __name__ == "__main__":
    main()
