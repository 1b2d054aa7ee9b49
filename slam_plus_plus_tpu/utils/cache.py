"""Persistent XLA compilation cache enablement.

The deep elimination/refactorization programs (block_cholesky,
incremental_cholesky) compile in seconds; caching them across runs makes
repeat solves of a dataset start in milliseconds.  Fills the role the
reference gets for free from ahead-of-time C++ compilation.
"""

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently point JAX at an on-disk compilation cache.

    Default location: <repo>/.jax_cache (gitignored).  Returns the dir."""
    global _enabled
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "SLAMPP_TPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
    if not _enabled:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
            _enabled = True
        except Exception:  # noqa: BLE001 — older jax: silently skip
            pass
    return cache_dir
