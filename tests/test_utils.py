"""Utils tests: torch-compatible fixed latents, image helpers, timers, dtypes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdbc_tpu.utils.dtypes import Policy, cast_floating, count_params
from sdbc_tpu.utils.image import (decode_and_prepare, image_grid,
                                  normalize_to_pm1, to_uint8)
from sdbc_tpu.utils.prng import per_sample_fixed_latents, torch_compat_randn
from sdbc_tpu.utils.profiling import StepTimer


def test_torch_compat_randn_matches_torch():
    torch = pytest.importorskip("torch")
    g = torch.Generator(device="cpu").manual_seed(42)
    ref = torch.randn(2, 3, 4, generator=g).numpy()
    ours = torch_compat_randn((2, 3, 4), seed=42)
    np.testing.assert_array_equal(ours, ref)


def test_per_sample_fixed_latents_protocol():
    """Matches the reference: ONE seeded generator, sequential randn draws
    (inference.py:263-274) — sample i depends only on seed and i."""
    torch = pytest.importorskip("torch")
    lat = per_sample_fixed_latents(3, (4, 8, 8), seed=42)
    assert lat.shape == (3, 4, 8, 8)
    g = torch.Generator(device="cpu").manual_seed(42)
    for i in range(3):
        expect = torch.randn(4, 8, 8, generator=g).numpy()
        np.testing.assert_array_equal(lat[i], expect)


def test_to_uint8_and_normalize_roundtrip():
    x = jnp.linspace(0, 1, 256).reshape(16, 16, 1)
    u8 = np.asarray(to_uint8(x))
    assert u8.dtype == np.uint8 and u8.min() == 0 and u8.max() == 255
    back = np.asarray(normalize_to_pm1(u8))
    assert back.min() >= -1.0 and back.max() <= 1.0


def test_image_grid():
    from PIL import Image

    imgs = [Image.new("RGB", (8, 8), (i * 40, 0, 0)) for i in range(6)]
    grid = image_grid(imgs, rows=2, cols=3)
    assert grid.size == (24, 16)
    with pytest.raises(AssertionError):
        image_grid(imgs, rows=2, cols=2)


def test_step_timer():
    t = StepTimer(images_per_step=8, n_chips=2, warmup=1)
    import time

    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary()
    assert s["steps"] == 3
    assert s["images_per_sec_per_chip"] > 0
    # warmup step excluded from steady stats
    assert len(t.steady_times) == 2


def test_policy_and_cast():
    p = Policy()
    tree = {"a": jnp.ones((2,), jnp.float32), "b": jnp.ones((2,), jnp.int32)}
    cast = cast_floating(tree, jnp.bfloat16)
    assert cast["a"].dtype == jnp.bfloat16
    assert cast["b"].dtype == jnp.int32  # ints untouched
    assert count_params(tree) == 4
