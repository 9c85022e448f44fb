from sdbc_tpu.eval.fid import (
    calculate_frechet_distance, calculate_activation_statistics,
    calculate_fid_given_paths, get_activations,
)

__all__ = [
    "calculate_frechet_distance", "calculate_activation_statistics",
    "calculate_fid_given_paths", "get_activations",
]
