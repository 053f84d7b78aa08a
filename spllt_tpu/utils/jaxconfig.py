"""JAX configuration helpers."""

from __future__ import annotations

__all__ = ["ensure_x64"]


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
