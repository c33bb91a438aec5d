"""Persistent XLA compilation cache.

The fused per-frame step and the single-dispatch BA schedule are large
programs; first compilation over the remote-compile tunnel takes minutes.
Enabling jax's persistent cache makes every later process start warm.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_compilation_cache(path: str | None = None):
    import jax

    d = os.path.abspath(path or os.environ.get("SVS_JAX_CACHE", _DEFAULT_DIR))
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs — harmless
