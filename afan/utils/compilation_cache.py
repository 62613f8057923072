"""Persistent XLA compilation cache.

Every fresh process pays full XLA compiles (10-25 min for the detection
flagship on a 1-core host with remote compile); JAX's persistent cache
serializes compiled executables to disk so identical (program, backend)
pairs reload in seconds across processes. Enabled by every CLI entry
point, bench.py, and the driver entry; disable with
``AFAN_NO_COMPILE_CACHE=1``. A backend that cannot serialize executables
degrades to a warning, not an error.
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    if os.environ.get("AFAN_NO_COMPILE_CACHE"):
        return
    import jax

    # CPU-only processes (the test mesh) skip the cache: XLA:CPU AOT
    # results are machine-feature-specific and a cached executable from a
    # different host profile can SIGILL (observed warning in the dryrun).
    # TPU executables are keyed by topology and safe to reuse.
    platforms = getattr(jax.config, "jax_platforms", None) or ""
    if platforms.strip() == "cpu":
        return
    if not platforms.strip():
        # platform config unset: resolve the actual backend (initializes
        # it, but every caller is about to use it anyway) — a CPU-only
        # host must not opt into the cache just because the config string
        # is empty.
        try:
            if jax.default_backend() == "cpu":
                return
        except Exception:
            return  # no backend at all: nothing to cache

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/afan_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or unsupported backend: silently skip
