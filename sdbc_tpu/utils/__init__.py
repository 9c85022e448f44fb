from sdbc_tpu.utils.dtypes import Policy, DEFAULT_POLICY, cast_tree, cast_floating
from sdbc_tpu.utils.prng import seeded_key, split_like, torch_compat_randn
from sdbc_tpu.utils.image import image_grid, to_uint8, normalize_to_pm1, resize_bicubic

__all__ = [
    "Policy", "DEFAULT_POLICY", "cast_tree", "cast_floating",
    "seeded_key", "split_like", "torch_compat_randn",
    "image_grid", "to_uint8", "normalize_to_pm1", "resize_bicubic",
]
