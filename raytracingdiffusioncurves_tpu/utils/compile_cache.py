"""Persistent XLA compilation cache (VERDICT r4 ask #3).

Every fresh process used to pay full jit compiles: bench setup 24-44 s,
perf-probe variants 26-240 s each (BENCH_r04, batch50) — against the
reference's seconds-class setup timer (optixHello.cpp:1156-1157).  JAX's
persistent compilation cache is the native fix: compiled executables are
keyed by (HLO, compile options, backend) and written to disk, so a warm
process deserializes instead of recompiling.

Call :func:`enable` before the first jit dispatch.  The cache directory
defaults to ``<repo-root>/.jax_cache`` (gitignored) and can be overridden
with the ``RTDC_JAX_CACHE`` env var; ``RTDC_JAX_CACHE=off`` disables.

Thresholds are zeroed (min entry size / min compile seconds) because even
"cheap" entries here ride a tunneled-TPU RPC worth avoiding.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_DIR = os.path.join(_REPO_ROOT, ".jax_cache")

_enabled = False


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache.  Returns the directory
    in use, or None when disabled (RTDC_JAX_CACHE=off)."""
    global _enabled
    env = os.environ.get("RTDC_JAX_CACHE")
    if env == "off":
        return None
    cache_dir = cache_dir or env or DEFAULT_DIR
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Cache XLA-level (autotune etc.) artifacts too where supported.
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
    _enabled = True
    return cache_dir
