"""Preallocated KV cache for `lax.scan` autoregressive decoding.

The reference keeps three divergent cache schemes (a growing list of stacked
tensors in Taming's minGPT, mutable per-layer tensors in RAR, xformers paged
attention in Chameleon). Under XLA we want one static-shaped buffer that is
functionally updated in place: ``[L, B, H, T_max, D]`` with
``dynamic_update_slice`` at the write position, which XLA turns into an
in-place donation inside the scan.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class KVCache:
    """Stacked per-layer key/value cache.

    k, v: ``[n_layers, batch, n_heads, max_len, head_dim]``.
    """

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, n_layers: int, batch: int, n_heads: int, max_len: int, head_dim: int, dtype=jnp.float32):
        shape = (n_layers, batch, n_heads, max_len, head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    def write(self, layer: int, pos, k_new: jnp.ndarray, v_new: jnp.ndarray) -> "KVCache":
        """Write ``[B, H, t, D]`` new keys/values for ``layer`` at ``pos``.

        ``layer`` is static (python int); ``pos`` may be traced.
        """
        idx = (jnp.int32(layer), jnp.int32(0), jnp.int32(0), jnp.asarray(pos, jnp.int32), jnp.int32(0))
        return KVCache(
            k=jax.lax.dynamic_update_slice(self.k, k_new[None].astype(self.k.dtype), idx),
            v=jax.lax.dynamic_update_slice(self.v, v_new[None].astype(self.v.dtype), idx),
        )

    def layer(self, layer: int):
        """Full-length K/V for one layer: ``([B, H, T_max, D], [B, H, T_max, D])``."""
        return self.k[layer], self.v[layer]

    def slice_to(self, t: int) -> "KVCache":
        """Static-length prefix view (phased decoding: early steps attend a
        short cache so HBM reads scale with the valid prefix)."""
        return KVCache(k=self.k[:, :, :, :t], v=self.v[:, :, :, :t])

    def merge_prefix(self, prefix: "KVCache") -> "KVCache":
        """Write a shorter-T cache back into this one's leading slots."""
        zeros = (jnp.int32(0),) * 5
        return KVCache(
            k=jax.lax.dynamic_update_slice(self.k, prefix.k.astype(self.k.dtype), zeros),
            v=jax.lax.dynamic_update_slice(self.v, prefix.v.astype(self.v.dtype), zeros),
        )
