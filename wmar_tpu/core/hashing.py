"""Vectorized integer hashing for on-device greenlist membership.

The reference implementation re-seeds a CPU ``torch.Generator`` and draws a
full vocab permutation *per sampling step per batch row*
(``wmar/watermarking/gentime_watermark.py:161-226`` in facebookresearch/wmar)
— a host-side serial bottleneck. On TPU we instead compute greenlist
membership as a stateless integer hash evaluated for all vocab entries at
once on the VPU: token ``t`` is green for context-key ``k`` iff
``hash(k, t) < threshold(t)``. This is a handful of elementwise uint32 ops
over a ``[B, V]`` tile — effectively free next to the transformer matmuls.

The hash is a murmur3-style avalanche mixer. It is *not* cryptographic; like
the reference's ``salt_key``-seeded Mersenne Twister it only needs to be
statistically uniform and deterministic given (salt, key, token).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# murmur3 / splitmix constants — numpy scalars, NOT jnp: a module-level jax
# array would initialize the XLA backend at import, breaking any later
# jax.distributed.initialize (multi-host bring-up imports this package first)
_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_GOLDEN = np.uint32(0x9E3779B9)


def fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: avalanche a uint32 array."""
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * _C1
    h = h ^ (h >> 13)
    h = h * _C2
    h = h ^ (h >> 16)
    return h


def hash_key_token(keys: jnp.ndarray, tokens: jnp.ndarray, salt: int) -> jnp.ndarray:
    """Hash (context-key, token) pairs to uniform uint32.

    Args:
      keys: int array, any shape ``S`` — the per-row context key
        (e.g. sum of the context window tokens).
      tokens: int array broadcastable against ``keys`` — vocab ids.
      salt: python int salt (the watermark's ``salt_key``).

    Returns:
      uint32 array of ``broadcast(S, tokens.shape)`` with uniform bits.
    """
    k = fmix32(keys.astype(jnp.uint32) * _GOLDEN + jnp.uint32(salt & 0xFFFFFFFF))
    t = tokens.astype(jnp.uint32) * _C1
    return fmix32(k ^ t ^ (t >> 15))


def uniform_from_hash(bits: jnp.ndarray) -> jnp.ndarray:
    """Map uint32 hash bits to float32 uniforms in [0, 1)."""
    return bits.astype(jnp.float32) * jnp.float32(2.0**-32)
