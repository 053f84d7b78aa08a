"""JAX configuration helpers."""

from __future__ import annotations

import os

__all__ = ["ensure_x64", "enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    Level-scheduled programs are matrix-specific and compile once per
    pattern; caching them on disk makes repeated factorizations of the
    same pattern (the reference's akeep-reuse workflow) start instantly
    across processes.
    """
    import jax

    path = path or os.environ.get(
        "SPLLT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "spllt_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs


def ensure_x64() -> None:
    """Enable 64-bit types; raise if jax silently cannot honor float64.

    jax defaults to 32-bit unless ``jax_enable_x64`` is set; when a user
    asks for a float64 factorization we must not silently truncate
    (the reference is a double-precision solver).
    """
    import jax

    if jax.config.jax_enable_x64:
        return
    try:
        jax.config.update("jax_enable_x64", True)
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            "dtype='float64' requires jax x64 mode; set JAX_ENABLE_X64=1 "
            "before jax initialises") from e
