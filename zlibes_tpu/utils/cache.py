"""Persistent XLA compilation cache setup.

The codec compiles one program per (lanes, tokens, table-width) bucket;
first-compile on the remote-compile path is tens of seconds.  A persistent
on-disk cache makes every process after the first start warm.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/zlibes_tpu/xla")
_done = False


def enable_persistent_cache(path: str | None = None) -> None:
    """Enable the on-disk cache for accelerator backends.

    Deliberately skipped for CPU: XLA:CPU AOT cache entries are
    machine-feature-sensitive and reload with loud warnings.
    """
    global _done
    if _done:
        return
    _done = True
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return
    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these options
