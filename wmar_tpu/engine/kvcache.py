"""Preallocated KV cache for `lax.scan` autoregressive decoding.

The reference keeps three divergent cache schemes (a growing list of stacked
tensors in Taming's minGPT, mutable per-layer tensors in RAR, xformers paged
attention in Chameleon). Under XLA we want one static-shaped buffer that is
functionally updated in place: ``[L, B, H, T_max, D]`` with
``dynamic_update_slice`` at the write position, which XLA turns into an
in-place donation inside the scan.
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CacheSpec:
    """A ``cache_dtype`` value that also carries multi-chip sharding context.

    Wrappers thread ``cache_dtype`` verbatim into :meth:`KVCache.zeros`, so a
    spec in that slot is how the entry points (``generate.py --dp/--tp``)
    hand the mesh to the packed caches without touching every constructor:
    the packed decode kernels then run per-chip under ``shard_map``
    (:func:`wmar_tpu.ops.flash_decode.sharded_packed_decode_attention`)
    instead of falling back to the XLA dequant path.
    """

    dtype: object = "packed"
    mesh: object = None
    dp_axis: object = None
    tp_axis: object = None


@flax.struct.dataclass
class KVCache:
    """Stacked per-layer key/value cache.

    k, v: ``[n_layers, batch, n_heads, max_len, head_dim]``.
    """

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, n_layers: int, batch: int, n_heads: int, max_len: int, head_dim: int, dtype=jnp.float32,
              mesh=None, dp_axis=None, tp_axis=None):
        if isinstance(dtype, CacheSpec):
            mesh, dp_axis, tp_axis = dtype.mesh, dtype.dp_axis, dtype.tp_axis
            dtype = dtype.dtype
        if dtype == jnp.int8:
            # decode attention is cache-read bandwidth bound (PERFORMANCE.md);
            # int8 halves the bytes vs bf16 at ~1/254 quantization noise
            return QuantKVCache.zeros(n_layers, batch, n_heads, max_len, head_dim)
        if dtype == "packed":
            return PackedQuantKVCache.zeros(n_layers, batch, n_heads, max_len,
                                            head_dim, mesh=mesh, dp_axis=dp_axis,
                                            tp_axis=tp_axis)
        if dtype == "packed4":
            return Packed4QuantKVCache.zeros(n_layers, batch, n_heads, max_len,
                                             head_dim, mesh=mesh, dp_axis=dp_axis,
                                             tp_axis=tp_axis)
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

@flax.struct.dataclass
class QuantKVCache:
    """int8 KV cache with per-(token, head) absmax scales.

    Same interface as :class:`KVCache`; ``layer()`` returns dequantized bf16
    tensors whose elementwise producer XLA fuses into the attention dots, so
    the HBM traffic per decode step is the int8 payload + scales — about half
    of a bf16 cache. Decode attention is cache-read bandwidth bound on this
    workload (PERFORMANCE.md: 1.9 s of a 2.78 s RAR-XL batch), which makes
    this the serving-path lever the reference reaches for with paged fp16
    caches + CUDA graphs. Not bit-exact vs a float cache: quantization noise
    is ~0.4% of each token's absmax, far below sampling temperature scales.

    k, v: int8 ``[L, B, H, T, D]``; k_scale, v_scale: bf16 ``[L, B, H, T]``.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: jnp.ndarray
    v_scale: jnp.ndarray

    @classmethod
    def zeros(cls, n_layers: int, batch: int, n_heads: int, max_len: int, head_dim: int):
        shape = (n_layers, batch, n_heads, max_len, head_dim)
        sshape = shape[:-1]
        return cls(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.bfloat16), v_scale=jnp.zeros(sshape, jnp.bfloat16),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @staticmethod
    def _quantize(x: jnp.ndarray):
        """[B, H, t, D] -> (int8 payload, bf16 per-(token, head) scale)."""
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
        return q.astype(jnp.int8), scale.astype(jnp.bfloat16)

    def write(self, layer: int, pos, k_new: jnp.ndarray, v_new: jnp.ndarray) -> "QuantKVCache":
        kq, ks = self._quantize(k_new)
        vq, vs = self._quantize(v_new)
        idx = (jnp.int32(layer), jnp.int32(0), jnp.int32(0), jnp.asarray(pos, jnp.int32), jnp.int32(0))
        sidx = idx[:-1]
        return QuantKVCache(
            k=jax.lax.dynamic_update_slice(self.k, kq[None], idx),
            v=jax.lax.dynamic_update_slice(self.v, vq[None], idx),
            k_scale=jax.lax.dynamic_update_slice(self.k_scale, ks[None], sidx),
            v_scale=jax.lax.dynamic_update_slice(self.v_scale, vs[None], sidx),
        )

    def layer(self, layer: int):
        """Dequantized full-length K/V for one layer (bf16): the multiply
        fuses into the downstream attention einsum, so HBM reads stay int8."""
        k = self.k[layer].astype(jnp.bfloat16) * self.k_scale[layer][..., None]
        v = self.v[layer].astype(jnp.bfloat16) * self.v_scale[layer][..., None]
        return k, v

@flax.struct.dataclass
class PackedQuantKVCache:
    """int8 KV cache in the packed-heads layout ``[L, B, T, 2*H*D]``.

    Same quantization math as :class:`QuantKVCache` (per-(token, head)
    absmax, so dequantized values are bit-identical), but K and V live in
    ONE payload array with the head axis folded into the minor dimension
    (first H*D lanes = K, last H*D = V), and the scales in one
    ``[L, B, 2H, T]`` array. That is the layout the batch-blocked Pallas
    decode kernel (:func:`wmar_tpu.ops.flash_decode.packed_decode_attention_q8`)
    wants:

    **Tensor parallelism** (``tp_groups > 1``): the plain layout's combined
    K|V lane axis cannot shard over heads — slicing ``2*H*D`` lanes into tp
    parts gives shard 0 all of K and shard 1 all of V. With ``tp_groups=g``
    the lanes are instead ordered ``[K_g0 | V_g0 | K_g1 | V_g1 | ...]``
    where group ``i`` holds heads ``[i*H/g, (i+1)*H/g)`` (scale rows
    likewise), so a lane axis sharded g-ways hands every chip a *valid local
    packed cache* over its own heads and the existing kernel runs unchanged
    inside ``shard_map`` (:func:`wmar_tpu.ops.flash_decode.sharded_packed_decode_attention`).
    ``g=1`` is byte-identical to the plain layout. The optional ``mesh`` /
    ``dp_axis`` / ``tp_axis`` statics carry the sharding context the decode
    dispatcher needs to build that ``shard_map`` — the TPU analogue of the
    reference pinning its paged fp16 cache to each GPU rank
    (``deps/chameleon/inference/transformer.py:159,220``).

    * one ``[RB, T, 2*H*D]`` tile per grid program = full-width contiguous
      DMAs, versus the ``[B, H, T, D]`` layout whose per-(b, h) ``[T, D]``
      slices are too narrow to saturate the DMA engines at image-model head
      dims (D=64: half a lane tile);
    * scales keep T on the LANE axis — a ``[..., H=16]``-minor array gets
      lane-padded 16 -> 128 by XLA, an 8x HBM read blowup (measured: the
      first integration of this cache lost 3x end-to-end to exactly that);
    * combining K/V halves the ``dynamic_update_slice`` count per decode
      step (2 ops/layer instead of 4) — the write path was 0.22 s of a
      2.38 s RAR-XL batch as 4 ops/layer (bench_rar_ablate).

    Single-token writes are cheap in this layout: ``[B, H, 1, D] ->
    [B, 1, H*D]`` is a pure reshape and the ``[B, H, t]`` scales store
    directly. Multi-token writes (prefill bursts) pay one small transpose.

    kv: int8 ``[L, B, T, 2*H*D]``; scale: bf16 ``[L, B, 2*H, T]``.
    """

    kv: jnp.ndarray
    scale: jnp.ndarray
    head_dim: int = flax.struct.field(pytree_node=False)
    tp_groups: int = flax.struct.field(pytree_node=False, default=1)
    mesh: object = flax.struct.field(pytree_node=False, default=None)
    dp_axis: object = flax.struct.field(pytree_node=False, default=None)
    tp_axis: object = flax.struct.field(pytree_node=False, default=None)

    @classmethod
    def zeros(cls, n_layers: int, batch: int, n_heads: int, max_len: int,
              head_dim: int, mesh=None, dp_axis=None, tp_axis=None):
        tp_groups = mesh.shape[tp_axis] if (mesh is not None and tp_axis) else 1
        assert n_heads % tp_groups == 0, (n_heads, tp_groups)
        return cls(
            kv=jnp.zeros((n_layers, batch, max_len, 2 * n_heads * head_dim), jnp.int8),
            scale=jnp.zeros((n_layers, batch, 2 * n_heads, max_len), jnp.bfloat16),
            head_dim=head_dim, tp_groups=tp_groups,
            mesh=mesh, dp_axis=dp_axis, tp_axis=tp_axis,
        )

    @property
    def max_len(self) -> int:
        return self.kv.shape[2]

    @property
    def n_heads(self) -> int:
        return self.scale.shape[2] // 2

    def write(self, layer: int, pos, k_new: jnp.ndarray, v_new: jnp.ndarray) -> "PackedQuantKVCache":
        """Write ``[B, H, t, D]`` keys/values: ONE payload + ONE scale DUS."""
        kq, ks = QuantKVCache._quantize(k_new)  # [B, H, t, D], [B, H, t]
        vq, vs = QuantKVCache._quantize(v_new)
        b, h, t, d = kq.shape
        g = self.tp_groups
        hl = h // g
        # per-group [K_gi | V_gi] lane blocks (g=1: plain [K | V])
        kt = kq.transpose(0, 2, 1, 3).reshape(b, t, g, hl * d)
        vt = vq.transpose(0, 2, 1, 3).reshape(b, t, g, hl * d)
        payload = jnp.concatenate([kt, vt], axis=-1).reshape(b, t, 2 * h * d)
        scales = jnp.concatenate(
            [ks.reshape(b, g, hl, t), vs.reshape(b, g, hl, t)], axis=2
        ).reshape(b, 2 * h, t)
        pos = jnp.asarray(pos, jnp.int32)
        return self.replace(
            kv=jax.lax.dynamic_update_slice(
                self.kv, payload[None],
                (jnp.int32(layer), jnp.int32(0), pos, jnp.int32(0))),
            scale=jax.lax.dynamic_update_slice(
                self.scale, scales[None],
                (jnp.int32(layer), jnp.int32(0), jnp.int32(0), pos)),
        )

    def layer(self, layer: int):
        """Dequantized ``[B, H, T, D]`` bf16 K/V (XLA-path fallback: prefill
        bursts and non-TPU backends). Values match :class:`QuantKVCache`
        bit-for-bit; only the storage layout differs."""
        b, t, hd2 = self.kv.shape[1:]
        h = self.n_heads
        d = self.head_dim
        g = self.tp_groups
        hl = h // g

        def unpack(payload, scale):  # [B, T, g, Hl, D], [B, g, Hl, T]
            x = payload.reshape(b, t, h, d).astype(jnp.bfloat16).transpose(0, 2, 1, 3)
            return x * scale.reshape(b, h, t)[..., None]

        pay = self.kv[layer].reshape(b, t, g, 2, hl, d)
        sc = self.scale[layer].reshape(b, g, 2, hl, t)
        return (
            unpack(pay[:, :, :, 0], sc[:, :, 0]),
            unpack(pay[:, :, :, 1], sc[:, :, 1]),
        )

@flax.struct.dataclass
class Packed4QuantKVCache:
    """int4 KV cache in the packed-heads layout: ONE ``[L, B, T, H*D]``
    uint8 array where each byte holds the K nibble (low) and V nibble
    (high) for the same (token, head, dim) — half the cache bytes of
    :class:`PackedQuantKVCache` with the identical kernel block structure.

    The packed decode kernel is DMA-bandwidth bound (PERFORMANCE.md: the
    DMA-only probe runs within 10% of the full kernel), so halving the
    payload is the remaining lever; the in-VMEM nibble unpack is VPU work
    the DMA stream hides. Quantization noise is ~1/14 of each token's
    absmax — appreciably coarser than int8, so this stays OPT-IN
    (``--cache_dtype packed4`` / ``BENCH_CACHE=packed4``) with quality
    measured, not assumed.

    kv: uint8 ``[L, B, T, H*D]``; scale: bf16 ``[L, B, 2*H, T]`` (rows
    ``[:H]`` = K scales, ``[H:]`` = V).

    The nibble payload's lane axis is head-major, so it tensor-parallel
    shards as-is; only the scale rows need the grouped ``[Ks_g0 | Vs_g0 |
    Ks_g1 | ...]`` order (``tp_groups``, see :class:`PackedQuantKVCache`)
    for a tp-sharded row axis to hand each chip its local ``[Ks | Vs]``.
    """

    kv: jnp.ndarray
    scale: jnp.ndarray
    head_dim: int = flax.struct.field(pytree_node=False)
    tp_groups: int = flax.struct.field(pytree_node=False, default=1)
    mesh: object = flax.struct.field(pytree_node=False, default=None)
    dp_axis: object = flax.struct.field(pytree_node=False, default=None)
    tp_axis: object = flax.struct.field(pytree_node=False, default=None)

    @classmethod
    def zeros(cls, n_layers: int, batch: int, n_heads: int, max_len: int,
              head_dim: int, mesh=None, dp_axis=None, tp_axis=None):
        tp_groups = mesh.shape[tp_axis] if (mesh is not None and tp_axis) else 1
        assert n_heads % tp_groups == 0, (n_heads, tp_groups)
        return cls(
            kv=jnp.zeros((n_layers, batch, max_len, n_heads * head_dim), jnp.uint8),
            scale=jnp.zeros((n_layers, batch, 2 * n_heads, max_len), jnp.bfloat16),
            head_dim=head_dim, tp_groups=tp_groups,
            mesh=mesh, dp_axis=dp_axis, tp_axis=tp_axis,
        )

    @property
    def max_len(self) -> int:
        return self.kv.shape[2]

    @property
    def n_heads(self) -> int:
        return self.scale.shape[2] // 2

    @staticmethod
    def _quantize4(x: jnp.ndarray):
        """[B, H, t, D] -> (nibble values in [1, 15] as uint8, bf16 scale)."""
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7)
        return (q + 8.0).astype(jnp.uint8), scale.astype(jnp.bfloat16)

    def write(self, layer: int, pos, k_new: jnp.ndarray, v_new: jnp.ndarray) -> "Packed4QuantKVCache":
        kq, ks = self._quantize4(k_new)  # [B, H, t, D], [B, H, t]
        vq, vs = self._quantize4(v_new)
        b, h, t, d = kq.shape
        g = self.tp_groups
        hl = h // g
        payload = kq | (vq << 4)  # K low nibble, V high
        payload = payload.transpose(0, 2, 1, 3).reshape(b, t, h * d)
        scales = jnp.concatenate(
            [ks.reshape(b, g, hl, t), vs.reshape(b, g, hl, t)], axis=2
        ).reshape(b, 2 * h, t)
        pos = jnp.asarray(pos, jnp.int32)
        return self.replace(
            kv=jax.lax.dynamic_update_slice(
                self.kv, payload[None],
                (jnp.int32(layer), jnp.int32(0), pos, jnp.int32(0))),
            scale=jax.lax.dynamic_update_slice(
                self.scale, scales[None],
                (jnp.int32(layer), jnp.int32(0), jnp.int32(0), pos)),
        )

    def layer(self, layer: int):
        """Dequantized ``[B, H, T, D]`` bf16 K/V (XLA fallback path)."""
        b, t, hd = self.kv.shape[1:]
        h = self.n_heads
        d = self.head_dim
        g = self.tp_groups
        hl = h // g
        u = self.kv[layer]
        sc = self.scale[layer].reshape(b, g, 2, hl, t)

        def unpack(nib, scale):  # nib [B, T, H*D] in [1,15], scale [B, g, Hl, T]
            x = (nib.astype(jnp.bfloat16) - 8.0).reshape(b, t, h, d).transpose(0, 2, 1, 3)
            return x * scale.reshape(b, h, t)[..., None]

        return (
            unpack(u & 0xF, sc[:, :, 0]),
            unpack(u >> 4, sc[:, :, 1]),
        )
