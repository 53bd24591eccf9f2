"""Persistent XLA compile-cache setup.

Every entry point (CLIs, tools, benchmarks) funnels through
:func:`enable_compile_cache` so repeated runs never re-pay compilation.
In this image compiles go through a remote helper and even trivial eager
ops (a ravel, a concatenate) cost ~0.4-2 s EACH to compile — a single CLI
run dispatches ~100+ distinct tiny programs, which at the default
min_compile_time threshold (they compile "fast") were never persisted and
re-compiled every process (~1-4 min of pure overhead per run, profiled
2026-08-17 on benchmarks/soak.py). Threshold 0 persists everything.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    path = (cache_dir
            or os.environ.get("TUMSEG_JAX_CACHE_DIR")
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or "/tmp/tumseg_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
