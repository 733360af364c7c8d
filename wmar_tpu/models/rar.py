"""RAR: randomized-order autoregressive image generator, TPU-native.

Re-implements the sampling path of RAR (reference:
``deps/rar/modeling/rar.py`` — decoder-only ViT with adaLN conditioning,
qk-norm attention, target-aware positional embeddings, cosine-annealed
in-batch CFG). Raster order only (the reference wrapper sets
``random_ratio = 0`` for generation, ``rar_wrapper.py:59``), so the
training-time order shuffling reduces to identity and is folded away.

Token space (``rar.py:322-328``):
  [0, K-1] image codes | K mask token | [K+1, K+nclass] class tokens |
  K+nclass+1 class-drop ("none") token.

Sizes (``rar_wrapper.py:43-51``): B/L/XL/XXL = 768x24 / 1024x24 / 1280x32 /
1408x40, 16 heads, mlp 4x, 256 image tokens.

The sampler runs both CFG branches as one 2B batch through a shared KV
cache, combines logits with the annealed scale, and hands them to the decode
engine — the whole 256-step generation is a single `lax.scan`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from wmar_tpu.core.sampling import cfg_combine, rar_cfg_scale
from wmar_tpu.engine.attention import cached_decode_attention
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.ops import wquant


@dataclasses.dataclass(frozen=True)
class RARConfig:
    embed_dim: int = 768
    depth: int = 24
    num_heads: int = 16
    intermediate_size: int = 3072
    image_seq_len: int = 256
    codebook_size: int = 1024
    num_classes: int = 1000

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def input_vocab(self) -> int:
        return self.codebook_size + 1 + self.num_classes + 1

    @property
    def none_condition_id(self) -> int:
        return self.num_classes + self.codebook_size + 1

    @property
    def max_positions(self) -> int:
        return self.image_seq_len + 2  # cls + condition + image tokens


def rar_config(size: str, **kw) -> RARConfig:
    dims = {
        "rar_b": (768, 24, 3072),
        "rar_l": (1024, 24, 4096),
        "rar_xl": (1280, 32, 5120),
        "rar_xxl": (1408, 40, 6144),
    }[size]
    return RARConfig(embed_dim=dims[0], depth=dims[1], intermediate_size=dims[2], **kw)


def init_rar_params(rng: jax.Array, cfg: RARConfig, dtype=jnp.float32):
    """Random init (truncated normal 0.02, adaLN-zero). Jitted as one XLA
    program — eager per-leaf init is pathologically slow on remote-compile
    TPU backends."""
    import functools

    return jax.jit(
        functools.partial(_init_rar_params_impl, cfg=cfg, dtype=dtype)
    )(rng)


def _init_rar_params_impl(rng: jax.Array, cfg: RARConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(rng, 8 + 12 * cfg.depth))

    def trunc(shape, std=0.02):
        return (jax.random.truncated_normal(next(keys), -2, 2, shape) * std).astype(dtype)

    def linear(n_in, n_out, zero=False):
        w = jnp.zeros((n_in, n_out), dtype) if zero else trunc((n_in, n_out))
        return {"w": w, "b": jnp.zeros((n_out,), dtype)}

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    d = cfg.embed_dim
    blocks = []
    for _ in range(cfg.depth):
        blocks.append(
            {
                "norm1": ln(d),
                "norm2": ln(d),
                "attn": {
                    "qkv": linear(d, 3 * d),
                    "q_norm": ln(cfg.head_dim),
                    "k_norm": ln(cfg.head_dim),
                    "proj": linear(d, d),
                },
                "mlp": {"fc1": linear(d, cfg.intermediate_size), "fc2": linear(cfg.intermediate_size, d)},
                # adaLN-zero init (the reference zeroes these too).
                "adaln": linear(d, 6 * d, zero=True),
            }
        )
    return {
        "cls_token": jnp.zeros((1, 1, d), dtype),
        "embeddings": trunc((cfg.input_vocab, d)),
        "pos_embed": trunc((cfg.image_seq_len + 1024, d)),
        "target_aware_pos_embed": trunc((cfg.image_seq_len + 1024, d)),
        "timesteps_embeddings": trunc((cfg.image_seq_len + 100, d)),
        "blocks": blocks,
        "final_adaln": linear(d, 2 * d, zero=True),
        "lm_head": linear(d, cfg.codebook_size),
    }


def _ln(x, p, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    if p:
        x = x * p["scale"] + p["bias"]
    return x


def _linear(x, p):
    # Handles both {"w","b"} and weight-only int8 {"w_q","w_scale","b"}
    # (per-output-channel absmax — see ops/wquant.py): the scale factors out
    # of the contraction, so the dot runs on the int8->bf16 operand and the
    # weights stream from HBM as int8, halving the ~0.9 GB/step weight
    # traffic of RAR-XL decode.
    return wquant.linear(x, p)


def quantize_rar_params_int8(params, compute_dtype=None, bits=8):
    """Weight-only int8 for every decode-path linear.

    Embeddings and norms stay floating point; when ``compute_dtype`` is given
    they (and the biases) are cast to it so the activation stream keeps the
    intended compute dtype — the embedding lookup seeds the dtype of every
    downstream matmul, so serving configs should pass ``jnp.bfloat16``.
    Opt-in lever: quality is measured (greedy agreement tests +
    PERFORMANCE.md), not assumed. ``bits=4`` switches to grouped int4
    (per-matrix int8 fallback on indivisible contraction dims)."""
    q = lambda p: wquant.quantize_linear(p, bits=bits, compute_dtype=compute_dtype)
    out = dict(params)
    out["blocks"] = [
        {
            **blk,
            "adaln": q(blk["adaln"]),
            "attn": {**blk["attn"],
                     "qkv": q(blk["attn"]["qkv"]),
                     "proj": q(blk["attn"]["proj"])},
            "mlp": {"fc1": q(blk["mlp"]["fc1"]), "fc2": q(blk["mlp"]["fc2"])},
        }
        for blk in params["blocks"]
    ]
    out["final_adaln"] = q(params["final_adaln"])
    out["lm_head"] = q(params["lm_head"])
    if compute_dtype is not None:
        for key in ("cls_token", "embeddings", "pos_embed",
                    "target_aware_pos_embed", "timesteps_embeddings"):
            out[key] = jnp.asarray(params[key]).astype(compute_dtype)
        # norms inside blocks: cast scale/bias leaves (int8 leaves untouched)
        out["blocks"] = wquant.cast_float_leaves(out["blocks"], compute_dtype)
    return out


def _modulate(x, shift, scale):
    return x * (1.0 + scale) + shift


def _block(blk, cfg: RARConfig, x, c, cache: Optional[KVCache], layer: int, pos):
    """One adaLN block on ``x [B, t, D]`` with per-position condition ``c``."""
    mods = _linear(jax.nn.silu(c), blk["adaln"])
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mods, 6, axis=-1)

    h = _modulate(_ln(x, blk["norm1"]), sh_msa, sc_msa)
    b, t, d = h.shape
    qkv = _linear(h, blk["attn"]["qkv"]).reshape(b, t, 3, cfg.num_heads, cfg.head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = _ln(q, blk["attn"]["q_norm"]).transpose(0, 2, 1, 3)
    k = _ln(k, blk["attn"]["k_norm"]).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    cache = cache.write(layer, pos, k, v)
    attn = cached_decode_attention(q, cache, layer, jnp.asarray(pos) + t)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + g_msa * _linear(attn, blk["attn"]["proj"])

    h2 = _modulate(_ln(x, blk["norm2"]), sh_mlp, sc_mlp)
    h2 = jax.nn.gelu(_linear(h2, blk["mlp"]["fc1"]), approximate=False)
    x = x + g_mlp * _linear(h2, blk["mlp"]["fc2"])
    return x, cache


def rar_forward_cached(
    params,
    cfg: RARConfig,
    x: jnp.ndarray,
    c: jnp.ndarray,
    cache: KVCache,
    pos,
) -> Tuple[jnp.ndarray, KVCache]:
    """Forward pre-embedded inputs ``x [B, t, D]`` at absolute ``pos``.

    ``c [B, t, D]`` is the per-position adaLN condition stream. Returns
    logits ``[B, codebook]`` for the last position plus the updated cache.
    """
    for li, blk in enumerate(params["blocks"]):
        x, cache = _block(blk, cfg, x, c, cache, li, pos)
    x_last, c_last = x[:, -1:], c[:, -1:]
    shift, scale = jnp.split(_linear(jax.nn.silu(c_last), params["final_adaln"]), 2, axis=-1)
    h = _modulate(_ln(x_last, {}), shift, scale)
    logits = _linear(h, params["lm_head"])
    return logits[:, 0], cache


def _embed_inputs(params, cfg: RARConfig, tokens: jnp.ndarray, positions: jnp.ndarray):
    """Token + positional + target-aware embeddings.

    Position ``i >= 1`` additionally carries
    ``target_aware_pos_embed[i + 1]`` — the pos-embed of the *next* slot
    (the token this position predicts), RAR's target-aware trick
    (``rar.py:345-371``); position 0 (cls) carries none.
    """
    emb = params["embeddings"][tokens] + params["pos_embed"][positions]
    ta = params["target_aware_pos_embed"][positions + 1]
    gate = ((positions >= 1) & (positions <= cfg.image_seq_len))[..., None]
    return emb + jnp.where(gate, ta, 0.0)


class RARSampler:
    """Per-batch sampling adapter (prefill + engine step_fn) with CFG.

    Construct once per generation batch: ``class_ids`` are bound eagerly so
    ``step_fn`` stays a pure closure (safe inside `lax.scan`).
    """

    def __init__(
        self,
        params,
        cfg: RARConfig,
        class_ids: jnp.ndarray,
        guidance_scale: float = 4.0,
        guidance_scale_pow: float = 0.0,
        cache_dtype=jnp.float32,
    ):
        self.params = params
        self.cfg = cfg
        self.guidance_scale = float(guidance_scale)
        self.guidance_scale_pow = float(guidance_scale_pow)
        self.cache_dtype = cache_dtype
        cond = jnp.asarray(class_ids, jnp.int32) + cfg.codebook_size + 1
        if self.use_cfg:
            none = jnp.full_like(cond, cfg.none_condition_id)
            cond = jnp.concatenate([cond, none], axis=0)
        self.cond_ids = cond  # [B or 2B]
        self.cond_emb = params["embeddings"][cond]  # [B or 2B, D]

    @property
    def use_cfg(self) -> bool:
        return self.guidance_scale != 0

    def _cond_stream(self, positions: jnp.ndarray):
        """adaLN condition: class embedding + per-position timestep embed."""
        return self.cond_emb[:, None, :] + self.params["timesteps_embeddings"][positions]

    def _combine(self, logits, step):
        if not self.use_cfg:
            return logits
        b = logits.shape[0] // 2
        scale = rar_cfg_scale(step, self.cfg.image_seq_len, self.guidance_scale, self.guidance_scale_pow)
        return cfg_combine(logits[:b], logits[b:], scale)

    def prefill(self, max_len: Optional[int] = None):
        """Process the [cls, condition] prefix; returns (step-0 logits, cache)."""
        cfg = self.cfg
        bb = self.cond_ids.shape[0]
        max_len = max_len or cfg.max_positions
        cache = KVCache.zeros(cfg.depth, bb, cfg.num_heads, max_len, cfg.head_dim, self.cache_dtype)

        cond_x = _embed_inputs(self.params, cfg, self.cond_ids[:, None], jnp.ones((1, 1), jnp.int32))
        cls = jnp.broadcast_to(
            self.params["cls_token"] + self.params["pos_embed"][0], (bb, 1, cfg.embed_dim)
        )
        x = jnp.concatenate([cls, cond_x], axis=1)
        c = self._cond_stream(jnp.array([0, 1], dtype=jnp.int32)[None, :])
        logits, cache = rar_forward_cached(self.params, cfg, x, c, cache, 0)
        return self._combine(logits, jnp.int32(0)), cache

    def step_fn(self, cache: KVCache, prev: jnp.ndarray, step):
        """Engine adapter: feed the sampled token, get logits for ``step``."""
        tokens = jnp.concatenate([prev, prev], axis=0) if self.use_cfg else prev
        pos = step + 1  # image token s-1 sits at absolute position s+1
        positions = jnp.broadcast_to(pos, (tokens.shape[0], 1)).astype(jnp.int32)
        x = _embed_inputs(self.params, self.cfg, tokens[:, None], positions)
        c = self._cond_stream(positions)  # [bb, 1] -> [bb, 1, D]
        logits, cache = rar_forward_cached(self.params, self.cfg, x, c, cache, pos)
        return self._combine(logits, step), cache
