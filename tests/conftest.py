"""Test harness: force CPU backend with 8 virtual devices.

The multi-device tests use the virtual CPU mesh as the fake-backend substitute
for a TPU pod (SURVEY.md §4).  NOTE: under the axon TPU plugin the
JAX_PLATFORMS env var is ignored; jax.config.update works.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def _ensure_map_count(min_needed: int = 262144) -> None:
    """Raise vm.max_map_count for the full-suite run (root only; no-op
    otherwise).

    One pytest process jit-compiles hundreds of CPU graphs; every LLVM JIT
    executable holds its own code mappings, and the process crosses ~65k
    VMAs a bit past the suite's midpoint.  At the default limit (65530)
    the next JIT mmap fails and LLVM SEGFAULTS the process mid-compile —
    a deterministic crash that looks like an XLA bug but is pure map
    exhaustion (measured: maps=65359 at the crash point, rc=139 in
    jax _src/compiler.py backend_compile_and_load).
    """
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            cur = int(f.read())
        if cur < min_needed:
            with open(path, "w") as f:
                f.write(str(min_needed))
    except (OSError, ValueError):
        print(f"WARNING: cannot raise {path} (need >= {min_needed}); a "
              "full-suite run may exhaust memory mappings and segfault "
              "late in the run — raise it as root or run the suite in "
              "two halves")


_ensure_map_count()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sdbc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # single-core host: reuse XLA compiles across runs

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from sdbc_tpu.diffusion.pipeline import PipelineConfig  # noqa: E402
from sdbc_tpu.models import clip, unet, vae  # noqa: E402


# --- smoke / full split -----------------------------------------------------
# `pytest -m smoke` = a <10-minute per-component-family subset (one test per
# test module + every golden), the CI-style gate for iteration; the full
# suite (`pytest tests/`) stays the release bar, and `-m "not smoke"` runs
# the remainder.  By default the first collected test of each module is the
# family representative; override per module here when that test is slow or
# unrepresentative.
SMOKE_OVERRIDES = {
    # first tests of these modules run sampling loops / many compiles;
    # pick a cheap but representative family member instead
    "test_cli.py": "test_grad_ckpt_tristate_parser",
    "test_serve.py": "test_hires_jobs_key_on_seed",
    "test_numpy_mirror.py": "test_timestep_embedding_layout",
}


def pytest_collection_modifyitems(config, items):
    smoke = pytest.mark.smoke
    seen = set()
    for item in items:
        mod = os.path.basename(str(item.fspath))
        if mod == "test_goldens.py":
            item.add_marker(smoke)
            continue
        want = SMOKE_OVERRIDES.get(mod)
        if want is not None:
            if want in item.name:
                item.add_marker(smoke)
            continue
        if mod not in seen:
            seen.add(mod)
            item.add_marker(smoke)


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
