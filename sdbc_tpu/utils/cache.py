"""Persistent XLA compilation cache.

This host has a single CPU core, so XLA compiles of the full SD graph take
many minutes; the persistent cache makes every process after the first reuse
them.  Called from all CLIs, bench.py, and __graft_entry__.py.
"""
from __future__ import annotations

import hashlib
import os
import platform

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/sdbc_jax_cache")


def machine_fingerprint() -> str:
    """Stable per-machine key for the compile cache.

    XLA:CPU persists AOT-compiled code specialized to the compiling host's
    CPU features; loading such an entry on a host with different features
    fails the feature check (cpu_aot_loader "machine type doesn't match"
    errors) and costs a failed-load *plus* a full recompile.  Keying the
    cache directory by CPU feature set keeps every entry loadable on the
    machine that reads it.
    """
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = ""
    except OSError:
        feats = platform.processor()
    raw = f"{platform.machine()}|{jax.__version__}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def enable_persistent_cache(path: str = "") -> str:
    path = path or os.environ.get("SDBC_JAX_CACHE", DEFAULT_DIR)
    try:
        on_cpu = jax.default_backend() == "cpu"
    except RuntimeError:
        on_cpu = True  # backend unavailable (chip tunnel outage)
    if on_cpu:
        # per-machine key on the CPU backend only: XLA:CPU AOT entries are
        # host-feature-specialized (see machine_fingerprint); TPU entries
        # target the chip and stay valid across hosts, so the shared flat
        # dir keeps its warm cross-round entries
        path = os.path.join(path, machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # config names can drift across jax versions
        print(f"persistent compile cache unavailable: {e}")
    return path
