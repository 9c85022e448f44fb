"""Capture diffusers UNet activations as fixtures for test_numpy_mirror.py.

Run this OUTSIDE the zero-egress environment, anywhere diffusers+torch and a
real SD-1.x checkpoint are available:

    python tests/capture_diffusers_fixtures.py /path/to/diffusers_ckpt

It records fixed inputs and the diffusers UNet's output to
tests/goldens/diffusers_fixtures.npz; test_numpy_mirror.py's
test_against_recorded_diffusers_activations then runs automatically and
compares the framework's ported forward pass against the recording
(round-1 VERDICT item 2's fixture-capture hook).
"""
import os
import sys

import numpy as np


def main(ckpt_dir: str) -> None:
    import torch
    from diffusers import UNet2DConditionModel

    unet = UNet2DConditionModel.from_pretrained(
        os.path.join(ckpt_dir, "unet")).eval()

    rng = np.random.default_rng(0)
    lat_nchw = rng.normal(size=(1, 4, 64, 64)).astype(np.float32)
    ctx = rng.normal(size=(1, 77, 768)).astype(np.float32)
    t = np.array([501], np.int64)

    with torch.no_grad():
        out = unet(torch.from_numpy(lat_nchw), torch.from_numpy(t),
                   torch.from_numpy(ctx)).sample.numpy()

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "goldens", "diffusers_fixtures.npz")
    np.savez(
        path,
        checkpoint_dir=np.asarray(os.path.abspath(ckpt_dir)),
        # NHWC for the framework side
        unet_in_latents=np.transpose(lat_nchw, (0, 2, 3, 1)),
        unet_in_t=t,
        unet_in_ctx=ctx,
        unet_out=np.transpose(out, (0, 2, 3, 1)),
    )
    print(f"fixtures written: {path}")


if __name__ == "__main__":
    main(sys.argv[1])
