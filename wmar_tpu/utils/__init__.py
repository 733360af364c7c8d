"""Shared utilities: metrics, checkpoint IO, weight deltas, conversion."""


def host_machine_tag() -> str:
    """Short fingerprint of this host's CPU feature set.

    XLA:CPU persistent-cache entries are AOT machine code whose cache key
    does NOT include the compile host's CPU features; loading an entry
    compiled on a different machine logs a ``cpu_aot_loader`` feature
    mismatch and can produce *different float results* (observed: golden
    e2e token flips from a cache carried across hosts). Keying the cache
    directory by this tag makes cross-host reuse impossible."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.strip()
                    break
    except OSError:
        pass
    return hashlib.sha1((platform.machine() + flags).encode()).hexdigest()[:10]


def tagged_cache_dir(base: str = "/root/repo/.jax_cache") -> str:
    """Create and return the host-fingerprinted compile-cache directory.

    Every CLI/tool that sets ``jax_compilation_cache_dir`` must go through
    this (or :func:`enable_compile_cache`) — a raw shared directory lets
    XLA:CPU AOT entries cross hosts, which silently changes float numerics
    (see :func:`host_machine_tag`)."""
    import os

    path = os.path.join(base, host_machine_tag())
    os.makedirs(path, exist_ok=True)
    return path


def enable_compile_cache():
    """Persistent XLA compile cache (remote-compile TPU backends take
    minutes on the first big program; cache hits bring reruns to seconds).
    The directory is keyed by the host CPU fingerprint — see
    :func:`host_machine_tag` for why."""
    import os

    import jax

    base = os.environ.get("WMAR_TPU_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        if not os.environ.get("WMAR_NO_JAX_CACHE"):
            jax.config.update("jax_compilation_cache_dir", tagged_cache_dir(base))
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
