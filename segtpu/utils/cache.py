"""Persistent XLA compilation cache (VERDICT r2 next #5).

The fused 1024x2048 inference program costs minutes of cold compile per
shape bucket per process start (BENCH_r02: 205 s through the dev relay);
the supernet's round-0 population step costs ~300 s. The design invariant
"one compiled program per shape bucket" only pays off if those programs
compile ONCE per machine, not once per process — so every entry point
(bench.py, segtpu.main_search, the Segmenter engine) calls
:func:`enable_compilation_cache` before first trace.

Knobs (read at call time):
  SEGTPU_CACHE_DIR  — cache directory (default ~/.cache/segtpu/xla)
  SEGTPU_NO_CACHE=1 — disable entirely (e.g. for cold-compile timing)
"""

from __future__ import annotations

import os

_ENABLED_DIR = None


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache. Returns
    the cache dir in use, or None when disabled via SEGTPU_NO_CACHE."""
    global _ENABLED_DIR
    if os.environ.get("SEGTPU_NO_CACHE", "") == "1":
        return None
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR
    cache_dir = (cache_dir or os.environ.get("SEGTPU_CACHE_DIR")
                 or os.path.expanduser("~/.cache/segtpu/xla"))
    os.makedirs(cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program: the big ones are minutes, but the engine also
    # reuses many small per-shape helpers, and entry-size floors would
    # silently skip them
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _ENABLED_DIR = cache_dir
    return cache_dir
