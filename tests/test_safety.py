"""Safety-checker slot: None-compatible (reference mode) + blocklist stand-in."""
import numpy as np

from sdbc_tpu.models.safety import BlocklistSafetyChecker, apply_safety_checker


def test_none_checker_passthrough():
    imgs = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    out, flags = apply_safety_checker(None, imgs, ["a", "b"])
    np.testing.assert_array_equal(out, imgs)
    assert flags == [False, False]


def test_blocklist_blacks_out_flagged():
    imgs = np.ones((2, 8, 8, 3), np.float32)
    checker = BlocklistSafetyChecker(["forbidden"])
    out, flags = apply_safety_checker(
        checker, imgs, ["a nice cover", "a FORBIDDEN thing"])
    assert flags == [False, True]
    np.testing.assert_array_equal(out[0], 1.0)
    np.testing.assert_array_equal(out[1], 0.0)
    # original array untouched
    np.testing.assert_array_equal(imgs[1], 1.0)


def test_no_prompts_no_flags():
    imgs = np.ones((1, 4, 4, 3), np.float32)
    out, flags = apply_safety_checker(BlocklistSafetyChecker(["x"]), imgs)
    assert flags == [False]
