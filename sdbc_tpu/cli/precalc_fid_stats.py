"""Precompute real-data FID statistics — the `precalc_fid_stats.py` equivalent.

The reference (precalc_fid_stats.py:49-152, SURVEY.md C14) stages the first
4000 test images into a raw .dat file, then loads them all to compute mu/sigma
through TF1.  Here the statistics stream directly over the image files with
running moments (no multi-GB staging file needed) and the extractor is the
JAX InceptionV3; resume falls out for free since nothing is staged.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from sdbc_tpu.cli import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default="./")
    p.add_argument("--csv_name", type=str, default="df_test.csv")
    p.add_argument("--num_imgs", type=int, default=4000)
    common.add_img_size_arg(p)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--out", type=str, default="./fid_stats.npz")
    common.bool_flag(p, "tiny", False, "tiny Inception config (tests)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.resolve_img_size(args)
    import pandas as pd

    from sdbc_tpu.eval.fid import activation_statistics_from_files, default_params
    from sdbc_tpu.models.inception import InceptionConfig

    df = pd.read_csv(os.path.join(args.data_root, args.csv_name), index_col=0)
    image_dir = os.path.join(args.data_root, "images", "images")
    files = [os.path.join(image_dir, f"{idx}.jpg")
             for idx in df.index[: args.num_imgs]]
    files = [f for f in files if os.path.exists(f)]
    print(f"computing FID stats over {len(files)} images")

    cfg = InceptionConfig.tiny() if args.tiny else InceptionConfig.fid()
    params = default_params(cfg)
    mu, sigma = activation_statistics_from_files(
        files, params, cfg, batch_size=args.batch_size,
        image_size=args.img_size, verbose=True)
    np.savez(args.out, mu=mu, sigma=sigma)
    print(f"saved {args.out}: mu {mu.shape}, sigma {sigma.shape}")


if __name__ == "__main__":
    main()
