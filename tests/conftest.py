"""Test harness: force CPU backend with 8 virtual devices.

The multi-device tests use the virtual CPU mesh as the fake-backend substitute
for a TPU pod (SURVEY.md §4).  NOTE: under the axon TPU plugin the
JAX_PLATFORMS env var is ignored; jax.config.update works.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sdbc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # single-core host: reuse XLA compiles across runs

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from sdbc_tpu.diffusion.pipeline import PipelineConfig  # noqa: E402
from sdbc_tpu.models import clip, unet, vae  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg() -> PipelineConfig:
    return PipelineConfig.tiny()


@pytest.fixture(scope="session")
def tiny_params(tiny_cfg):
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "text_encoder": clip.init(k1, tiny_cfg.clip),
        "unet": unet.init(k2, tiny_cfg.unet),
        "vae": vae.init(k3, tiny_cfg.vae),
    }
