"""Evaluation: FID math + image generation + prompt grids.

Lazy re-exports: importing ``sdbc_tpu.eval.generate`` (deliberately light —
no jax/Inception at import time) must not drag in the fid module.
"""

__all__ = [
    "calculate_frechet_distance", "calculate_activation_statistics",
    "calculate_fid_given_paths", "get_activations",
]


def __getattr__(name):
    if name in __all__:
        from sdbc_tpu.eval import fid as _fid

        return getattr(_fid, name)
    raise AttributeError(name)
