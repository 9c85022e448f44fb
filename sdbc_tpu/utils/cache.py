"""Persistent XLA compilation cache.

This host has a single CPU core, so XLA compiles of the full SD graph take
many minutes; the persistent cache makes every process after the first reuse
them.  Called from all CLIs, bench.py, and __graft_entry__.py.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/sdbc_jax_cache")


def enable_persistent_cache(path: str = "") -> str:
    path = path or os.environ.get("SDBC_JAX_CACHE", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # config names can drift across jax versions
        print(f"persistent compile cache unavailable: {e}")
    return path
