"""Shared utilities: metrics, checkpoint IO, weight deltas, conversion."""


def enable_compile_cache():
    """Persistent XLA compile cache (remote-compile TPU backends take
    minutes on the first big program; cache hits bring reruns to seconds)."""
    import os

    import jax

    path = os.environ.get("WMAR_TPU_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # Some environments pin the backend via a plugin at interpreter start, so
    # the standard JAX_PLATFORMS env is silently ignored; honor it here (all
    # CLIs call this before any backend use) so `JAX_PLATFORMS=cpu python
    # finetune.py ...` behaves as documented.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
