"""DC-AE (Deep Compression Autoencoder, EfficientViT) compressor.

Weight-compatible JAX port of ``diffusers.models.autoencoders.autoencoder_dc.
AutoencoderDC`` as used by the reference's ``DeepCompressionAE``
(``wmar/augmentations/neuralcompression.py:206-214``,
``mit-han-lab/dc-ae-f64c128-in-1.0-diffusers``): images are rescaled to
[-1, 1], deterministically encoded (no posterior sampling), decoded, and
rescaled back; nominal bpp is 1 (128 ch * 32 bit / 64^2 px).

Blocks implemented (diffusers naming, NHWC here):

- ``ResBlock``: conv3x3 -> silu -> conv3x3(no bias) -> norm -> +residual
- ``GLUMBConv``: 1x1 expand(x2) -> silu -> depthwise 3x3 -> gate (x*silu(g))
  -> 1x1 project(no bias) -> rms norm -> +residual
- ``SanaMultiscaleLinearAttention``: ReLU linear attention (value padded with
  a ones row as the normalizer) over concatenated [qkv, multiscale-conv(qkv)]
  branches; quadratic fallback when the token count <= head dim
- ``DCDownBlock2d``: strided conv or conv+pixel_unshuffle, plus a
  pixel-unshuffle + channel-group-average shortcut
- ``DCUpBlock2d``: nearest-interpolate+conv or conv+pixel_shuffle, plus a
  channel repeat_interleave + pixel_shuffle shortcut
- encoder ``out_shortcut`` (channel-group average onto the latent) and
  decoder ``in_shortcut`` (latent repeat_interleave onto the trunk)

The converter is *shape-driven*: the whole stage geometry (channels, layers,
block types, down/upsample modes, stem/head types) is reconstructed from the
state dict itself by walking the ``encoder.down_blocks.{i}.{j}`` /
``decoder.up_blocks.{i}.{j}`` Sequentials and chaining conv shapes, so the
published checkpoint's config does not have to be known a priori. Structure
metadata lives in a hashable :class:`DCAEConfig` (static under jit); params
are a pure array pytree. Decoder stages execute deep-to-shallow with each
stage's upsampler first, mirroring the reference decoder.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")
_EPS_NORM = 1e-5
_EPS_ATTN = 1e-15


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class OpSpec:
    kind: str  # "res" | "evit" | "down" | "up" | "conv"
    out_channels: int = 0  # down/up: target channels (for the shortcut math)
    mode: str = ""  # down: "conv"|"pixel_unshuffle"; up: "interpolate"|"pixel_shuffle"
    shortcut: bool = True
    multiscales: Tuple[int, ...] = ()  # evit: multiscale kernel sizes


@dataclasses.dataclass(frozen=True)
class DCAEConfig:
    encoder_ops: Tuple[Tuple[OpSpec, ...], ...]  # ops per encoder stage
    decoder_ops: Tuple[Tuple[OpSpec, ...], ...]  # ops per decoder stage (as stored)
    enc_stem: OpSpec  # "conv" or "down" (0-layer first stage => downsampling stem)
    dec_head: OpSpec  # "conv" or "up"
    latent_channels: int
    attention_head_dim: int = 32
    in_channels: int = 3
    nominal_bpp: float = 1.0
    # decoder stage execution order (deep trunk first). The converter detects
    # whether a checkpoint stores up_blocks shallow-first (config order) or
    # deep-first by locating the one staged block-list without an upsampler.
    decoder_exec: Tuple[int, ...] = ()
    deepest_channels: int = 0  # trunk width at the latent (decoder conv_in out)

    def exec_order(self) -> Tuple[int, ...]:
        if self.decoder_exec:
            return self.decoder_exec
        return tuple(range(len(self.decoder_ops) - 1, -1, -1))

    @staticmethod
    def from_diffusers(block_types, channels, layers, multiscales,
                       latent_channels, attention_head_dim=32,
                       downsample_block_type="conv",
                       upsample_block_type="interpolate",
                       in_channels=3, nominal_bpp=1.0) -> "DCAEConfig":
        """Build from the diffusers AutoencoderDC config fields (one set used
        for both sides here; see :func:`infer config <infer>` for asymmetric
        real checkpoints — this ctor is mainly for tests/random slots)."""
        n = len(channels)
        enc_stages: List[Tuple[OpSpec, ...]] = []
        dec_stages: List[Tuple[OpSpec, ...]] = []
        for i in range(n):
            blk = OpSpec("res" if block_types[i] == "ResBlock" else "evit",
                         channels[i], multiscales=tuple(multiscales[i]))
            enc_ops = [dataclasses.replace(blk) for _ in range(layers[i])]
            if i < n - 1 and layers[i] > 0:
                enc_ops.append(OpSpec("down", channels[i + 1], downsample_block_type))
            enc_stages.append(tuple(enc_ops))
            dec_ops: List[OpSpec] = []
            if i < n - 1 and layers[i] > 0:
                dec_ops.append(OpSpec("up", channels[i], upsample_block_type))
            dec_ops += [dataclasses.replace(blk) for _ in range(layers[i])]
            dec_stages.append(tuple(dec_ops))
        if layers[0] > 0:
            enc_stem = OpSpec("conv", channels[0])
            dec_head = OpSpec("conv", in_channels)
        else:
            enc_stem = OpSpec("down", channels[0], downsample_block_type, shortcut=False)
            dec_head = OpSpec("up", in_channels, upsample_block_type, shortcut=False)
            # chain stage0 -> stage1 via a shortcutted downsample/upsample
            enc_stages[0] = (OpSpec("down", channels[1], downsample_block_type),)
            dec_stages[0] = (OpSpec("up", channels[0], upsample_block_type),)
        return DCAEConfig(tuple(enc_stages), tuple(dec_stages), enc_stem, dec_head,
                          latent_channels, attention_head_dim, in_channels, nominal_bpp,
                          decoder_exec=tuple(range(n - 1, -1, -1)),
                          deepest_channels=channels[-1])

    @staticmethod
    def tiny(deep_stem: bool = False) -> "DCAEConfig":
        layers = [0, 1, 1] if deep_stem else [1, 1, 1]
        return DCAEConfig.from_diffusers(
            ["ResBlock", "ResBlock", "EfficientViTBlock"], [8, 16, 16], layers,
            [(), (), (5,)], latent_channels=4, attention_head_dim=4)



# ---------------------------------------------------------------------------
# primitive ops (params are dicts of arrays, HWIO kernels)
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1, groups=1):
    k = p["kernel"]
    pad = (k.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=DN, feature_group_count=groups,
    )
    return y + p["bias"] if "bias" in p else y


def _rms_norm(p, x):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = (x.astype(jnp.float32) * jax.lax.rsqrt(var + _EPS_NORM)).astype(x.dtype)
    y = y * p["scale"]
    return y + p["bias"] if "bias" in p else y


def _batch_norm(p, x):
    inv = jax.lax.rsqrt(p["var"] + _EPS_NORM)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _norm(p, x):
    return _batch_norm(p, x) if "mean" in p else _rms_norm(p, x)


def _pixel_unshuffle(x, r=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # channel order c*r^2 + i*r + j (torch)
    return x.reshape(b, h // r, w // r, c * r * r)


def _pixel_shuffle(x, r=2):
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def _group_average(x, out_channels):
    b, h, w, c = x.shape
    return x.reshape(b, h, w, out_channels, c // out_channels).mean(axis=-1)


def _res_block(p, x):
    h = _conv(p["conv1"], x)
    h = jax.nn.silu(h)
    h = _conv(p["conv2"], h)
    h = _norm(p["norm"], h)
    return x + h


def _glumb_conv(p, x):
    residual = x
    h = _conv(p["conv_inverted"], x)
    h = jax.nn.silu(h)
    h = _conv(p["conv_depth"], h, groups=h.shape[-1])
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.silu(gate)
    h = _conv(p["conv_point"], h)
    h = _rms_norm(p["norm"], h)
    return h + residual


def _sana_attention(p, x, head_dim):
    """SanaMultiscaleLinearAttention + residual (diffusers
    attention_processor.SanaMultiscaleAttnProcessor2_0)."""
    b, hh, ww, c = x.shape
    residual = x
    qkv = jnp.concatenate([x @ p["to_q"], x @ p["to_k"], x @ p["to_v"]], axis=-1)
    branches = [qkv]
    for ms in p["multiscale"]:
        y = _conv(ms["proj_in"], qkv, groups=qkv.shape[-1])
        groups = qkv.shape[-1] // ms["proj_out"]["kernel"].shape[2]
        y = _conv(ms["proj_out"], y, groups=groups)
        branches.append(y)
    h = jnp.concatenate(branches, axis=-1)  # B H W 3*inner*(1+n)
    n_tok = hh * ww
    h = h.reshape(b, n_tok, -1, 3 * head_dim).transpose(0, 2, 3, 1)  # B,heads,3d,N
    q, k, v = jnp.split(h, 3, axis=2)
    q = jax.nn.relu(q)
    k = jax.nn.relu(k)
    if n_tok > head_dim:  # linear attention, float32 like the reference
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        v1 = jnp.concatenate([v, jnp.ones_like(v[:, :, :1])], axis=2)
        out = (v1 @ k.transpose(0, 1, 3, 2)) @ q  # [B,h,d+1,N]
        out = out[:, :, :-1] / (out[:, :, -1:] + _EPS_ATTN)
    else:  # quadratic attention
        scores = (k.transpose(0, 1, 3, 2) @ q).astype(jnp.float32)  # [B,h,N,N]
        scores = scores / (jnp.sum(scores, axis=2, keepdims=True) + _EPS_ATTN)
        out = v.astype(jnp.float32) @ scores
    out = out.astype(x.dtype).transpose(0, 3, 1, 2).reshape(b, hh, ww, -1)
    out = out @ p["to_out"]
    out = _norm(p["norm_out"], out)
    return out + residual


def _dc_down(p, x, spec: OpSpec):
    y = _conv(p["conv"], x, stride=1 if spec.mode == "pixel_unshuffle" else 2)
    if spec.mode == "pixel_unshuffle":
        y = _pixel_unshuffle(y)
    if spec.shortcut:
        y = y + _group_average(_pixel_unshuffle(x), spec.out_channels)
    return y


def _dc_up(p, x, spec: OpSpec):
    if spec.mode == "interpolate":
        b, h, w, c = x.shape
        y = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        return _conv(p["conv"], y)
    y = _pixel_shuffle(_conv(p["conv"], x))
    if spec.shortcut:
        repeats = spec.out_channels * 4 // x.shape[-1]
        y = y + _pixel_shuffle(jnp.repeat(x, repeats, axis=-1))
    return y


def _run_op(p, x, spec: OpSpec, head_dim: int):
    if spec.kind == "res":
        return _res_block(p, x)
    if spec.kind == "evit":
        x = _sana_attention(p["attn"], x, head_dim)
        return _glumb_conv(p["conv_out"], x)
    if spec.kind == "down":
        return _dc_down(p, x, spec)
    if spec.kind == "up":
        return _dc_up(p, x, spec)
    raise ValueError(spec.kind)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def dcae_encode(params: dict, cfg: DCAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x in [-1,1] NHWC -> latent [B, H/f, W/f, latent_channels]."""
    enc = params["encoder"]
    if cfg.enc_stem.kind == "conv":
        h = _conv(enc["conv_in"], x)
    else:
        h = _dc_down(enc["conv_in"], x, cfg.enc_stem)
    for i, stage in enumerate(cfg.encoder_ops):
        for j, spec in enumerate(stage):
            h = _run_op(enc["down_blocks"][i][j], h, spec, cfg.attention_head_dim)
    z = _conv(enc["conv_out"], h)
    return z + _group_average(h, cfg.latent_channels)  # out_shortcut


def dcae_decode(params: dict, cfg: DCAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    dec = params["decoder"]
    h = _conv(dec["conv_in"], z)
    h = h + jnp.repeat(z, cfg.deepest_channels // cfg.latent_channels, axis=-1)  # in_shortcut
    for i in cfg.exec_order():  # deep -> shallow
        for j, spec in enumerate(cfg.decoder_ops[i]):
            h = _run_op(dec["up_blocks"][i][j], h, spec, cfg.attention_head_dim)
    h = _rms_norm(dec["norm_out"], h)
    h = jax.nn.relu(h)
    if cfg.dec_head.kind == "conv":
        return _conv(dec["conv_out"], h)
    return _dc_up(dec["conv_out"], h, cfg.dec_head)


def dcae_roundtrip(params: dict, cfg: DCAEConfig, x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [0,1]: DeepCompressionAE rescales to [-1,1] around the codec
    (neuralcompression.py:131-140,158-163)."""
    z = dcae_encode(params, cfg, 2.0 * x01 - 1.0)
    y = dcae_decode(params, cfg, z)
    return (y + 1.0) / 2.0


# ---------------------------------------------------------------------------
# conversion from a diffusers AutoencoderDC state dict (shape-driven)
# ---------------------------------------------------------------------------


def _cv(sd, p):
    out = {"kernel": np.ascontiguousarray(np.transpose(np.asarray(sd[p + ".weight"]), (2, 3, 1, 0)))}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _nm(sd, p):
    out = {"scale": np.asarray(sd[p + ".weight"])}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    if p + ".running_mean" in sd:
        out["mean"] = np.asarray(sd[p + ".running_mean"])
        out["var"] = np.asarray(sd[p + ".running_var"])
    return out


def _block_type_at(sd, prefix):
    if prefix + ".attn.to_q.weight" in sd:
        return "evit"
    if prefix + ".conv1.weight" in sd:
        return "res"
    if prefix + ".conv.weight" in sd:
        return "downup"
    raise KeyError(f"unrecognized block at {prefix}")


def _convert_block(sd, prefix, kind):
    if kind == "res":
        return {"conv1": _cv(sd, prefix + ".conv1"),
                "conv2": _cv(sd, prefix + ".conv2"),
                "norm": _nm(sd, prefix + ".norm")}
    ms, i = [], 0
    while f"{prefix}.attn.to_qkv_multiscale.{i}.proj_in.weight" in sd:
        ms.append({"proj_in": _cv(sd, f"{prefix}.attn.to_qkv_multiscale.{i}.proj_in"),
                   "proj_out": _cv(sd, f"{prefix}.attn.to_qkv_multiscale.{i}.proj_out")})
        i += 1
    lin = lambda p: np.ascontiguousarray(np.asarray(sd[p + ".weight"]).T)  # noqa: E731
    return {
        "attn": {"to_q": lin(prefix + ".attn.to_q"), "to_k": lin(prefix + ".attn.to_k"),
                 "to_v": lin(prefix + ".attn.to_v"), "multiscale": ms,
                 "to_out": lin(prefix + ".attn.to_out"),
                 "norm_out": _nm(sd, prefix + ".attn.norm_out")},
        "conv_out": {"conv_inverted": _cv(sd, prefix + ".conv_out.conv_inverted"),
                     "conv_depth": _cv(sd, prefix + ".conv_out.conv_depth"),
                     "conv_point": _cv(sd, prefix + ".conv_out.conv_point"),
                     "norm": _nm(sd, prefix + ".conv_out.norm")},
    }


def _seq_indices(sd, stage_prefix):
    idx = set()
    for key in sd:
        if key.startswith(stage_prefix + "."):
            idx.add(int(key[len(stage_prefix) + 1:].split(".")[0]))
    return sorted(idx)


def convert_dcae(sd, attention_head_dim: int = 32, in_channels: int = 3,
                 nominal_bpp: float = 1.0) -> Tuple[dict, DCAEConfig]:
    """diffusers AutoencoderDC state dict -> (params pytree, DCAEConfig).

    Fully shape-driven: stage structure, block types, multiscale kernels and
    down/up-sample modes are read off the checkpoint (conv channel chaining
    distinguishes strided-conv vs pixel-(un)shuffle and interpolate vs
    pixel-shuffle variants, since strides are not stored in weights).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    latent = int(sd["decoder.conv_in.weight"].shape[1])

    def side(tree):
        n_stages = 1 + max(int(k[len(tree) + 1:].split(".")[0])
                           for k in sd if k.startswith(tree + "."))
        specs: List[List[OpSpec]] = []
        blocks: List[List[dict]] = []
        for i in range(n_stages):
            specs.append([])
            blocks.append([])
            for j in _seq_indices(sd, f"{tree}.{i}"):
                prefix = f"{tree}.{i}.{j}"
                kind = _block_type_at(sd, prefix)
                if kind == "downup":
                    specs[-1].append(OpSpec("downup"))  # fixed up below
                    blocks[-1].append({"conv": _cv(sd, prefix + ".conv")})
                else:
                    w = sd[prefix + (".conv1.weight" if kind == "res" else ".attn.to_q.weight")]
                    ch = int(w.shape[0] if kind == "res" else w.shape[1])
                    blk = _convert_block(sd, prefix, kind)
                    ms: Tuple[int, ...] = ()
                    if kind == "evit":
                        ms = tuple(m["proj_in"]["kernel"].shape[0] for m in blk["attn"]["multiscale"])
                    specs[-1].append(OpSpec(kind, ch, multiscales=ms))
                    blocks[-1].append(blk)
        return specs, blocks

    enc_specs, enc_blocks = side("encoder.down_blocks")
    dec_specs, dec_blocks = side("decoder.up_blocks")

    # --- resolve encoder downsample modes by channel chaining
    def next_block_in_channels(specs, blocks, i, j):
        """Input channels of the first res/evit block after (i, j)."""
        for ii in range(i, len(specs)):
            for jj in range(j + 1 if ii == i else 0, len(specs[ii])):
                s = specs[ii][jj]
                if s.kind == "res":
                    return int(blocks[ii][jj]["conv1"]["kernel"].shape[2])
                if s.kind == "evit":
                    return int(blocks[ii][jj]["attn"]["to_q"].shape[0])
        return None

    for i, stage in enumerate(enc_specs):
        for j, s in enumerate(stage):
            if s.kind != "downup":
                continue
            out = int(enc_blocks[i][j]["conv"]["kernel"].shape[3])
            nxt = next_block_in_channels(enc_specs, enc_blocks, i, j)
            if nxt is None:
                nxt = int(sd["encoder.conv_out.weight"].shape[1])
            mode = "pixel_unshuffle" if out * 4 == nxt else "conv"
            target = out * 4 if mode == "pixel_unshuffle" else out
            stage[j] = OpSpec("down", target, mode)

    # --- resolve decoder upsample modes; each stage's Sequential starts with
    # its upsampler, followed by that stage's blocks
    for i in range(len(dec_specs)):
        for j, s in enumerate(dec_specs[i]):
            if s.kind != "downup":
                continue
            kernel = dec_blocks[i][j]["conv"]["kernel"]
            cin, cout = int(kernel.shape[2]), int(kernel.shape[3])
            # after this upsampler come this stage's blocks (or the head)
            target = None
            for jj in range(j + 1, len(dec_specs[i])):
                if dec_specs[i][jj].kind in ("res", "evit"):
                    target = dec_specs[i][jj].out_channels
                    break
            if target is None:
                target = int(sd["decoder.norm_out.weight"].shape[0])
            mode = "pixel_shuffle" if cout == target * 4 else "interpolate"
            dec_specs[i][j] = OpSpec("up", target, mode)

    # --- stems and heads
    if "encoder.conv_in.conv.weight" in sd:
        w = sd["encoder.conv_in.conv.weight"]
        out = int(w.shape[0])
        if enc_specs[0] and enc_specs[0][0].kind == "down":
            # stage 0 holds only a downsampler; chain through its conv input
            nxt = int(enc_blocks[0][0]["conv"]["kernel"].shape[2])
        else:
            nxt = next_block_in_channels(enc_specs, enc_blocks, 0, -1)
        if nxt is None:
            nxt = int(sd["encoder.conv_out.weight"].shape[1])
        mode = "pixel_unshuffle" if out * 4 == nxt else "conv"
        enc_stem = OpSpec("down", out * 4 if mode == "pixel_unshuffle" else out,
                          mode, shortcut=False)
        enc_conv_in = {"conv": _cv(sd, "encoder.conv_in.conv")}
    else:
        enc_stem = OpSpec("conv", int(sd["encoder.conv_in.weight"].shape[0]))
        enc_conv_in = _cv(sd, "encoder.conv_in")
    if "decoder.conv_out.conv.weight" in sd:
        w = sd["decoder.conv_out.conv.weight"]
        mode = "pixel_shuffle" if int(w.shape[0]) == in_channels * 4 else "interpolate"
        dec_head = OpSpec("up", in_channels, mode, shortcut=False)
        dec_conv_out = {"conv": _cv(sd, "decoder.conv_out.conv")}
    else:
        dec_head = OpSpec("conv", in_channels)
        dec_conv_out = _cv(sd, "decoder.conv_out")

    # --- decoder stage storage order: among stages that contain blocks,
    # exactly one has no leading upsampler — the deepest. If it is stored at
    # index 0, up_blocks are deep-first (execute ascending); if at the last
    # index, they are in config order (execute descending).
    n_dec = len(dec_specs)
    staged = [i for i, s in enumerate(dec_specs)
              if any(op.kind in ("res", "evit") for op in s)]
    no_up = [i for i in staged if not any(op.kind == "up" for op in dec_specs[i])]
    if len(no_up) == 1 and no_up[0] == min(staged) and no_up[0] != max(staged):
        decoder_exec = tuple(range(n_dec))  # deep-first storage
    else:
        decoder_exec = tuple(range(n_dec - 1, -1, -1))  # config-order storage

    cfg = DCAEConfig(
        tuple(tuple(s) for s in enc_specs), tuple(tuple(s) for s in dec_specs),
        enc_stem, dec_head, latent, attention_head_dim, in_channels, nominal_bpp,
        decoder_exec=decoder_exec,
        deepest_channels=int(sd["decoder.conv_in.weight"].shape[0]),
    )
    params = {
        "encoder": {"conv_in": enc_conv_in,
                    "down_blocks": enc_blocks,
                    "conv_out": _cv(sd, "encoder.conv_out")},
        "decoder": {"conv_in": _cv(sd, "decoder.conv_in"),
                    "up_blocks": dec_blocks,
                    "norm_out": _nm(sd, "decoder.norm_out"),
                    "conv_out": dec_conv_out},
    }
    return params, cfg


# ---------------------------------------------------------------------------
# random init (tests / acknowledged random slots)
# ---------------------------------------------------------------------------


def init_dcae_params(seed: int, cfg: DCAEConfig) -> dict:
    rng = np.random.default_rng(seed)

    def conv(cin, cout, k=3, bias=True, groups=1):
        std = 1.0 / np.sqrt(cin // groups * k * k)
        p = {"kernel": rng.uniform(-std, std, (k, k, cin // groups, cout)).astype(np.float32)}
        if bias:
            p["bias"] = rng.uniform(-std, std, (cout,)).astype(np.float32)
        return p

    def norm(c):
        return {"scale": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}

    def lin(ci, co):
        return (rng.uniform(-1, 1, (ci, co)) / np.sqrt(ci)).astype(np.float32)

    def make_op(spec: OpSpec, cin: int) -> Tuple[dict, int]:
        if spec.kind == "res":
            c = spec.out_channels
            return {"conv1": conv(c, c), "conv2": conv(c, c, bias=False),
                    "norm": norm(c)}, c
        if spec.kind == "evit":
            c = spec.out_channels
            heads = c // cfg.attention_head_dim
            inner = heads * cfg.attention_head_dim
            ms = [{"proj_in": conv(3 * inner, 3 * inner, ksz, bias=False, groups=3 * inner),
                   "proj_out": conv(3 * inner, 3 * inner, 1, bias=False, groups=3 * heads)}
                  for ksz in spec.multiscales]
            hid = c * 4
            return {
                "attn": {"to_q": lin(c, inner), "to_k": lin(c, inner), "to_v": lin(c, inner),
                         "multiscale": ms, "to_out": lin(inner * (1 + len(ms)), c),
                         "norm_out": norm(c)},
                "conv_out": {"conv_inverted": conv(c, 2 * hid, 1),
                             "conv_depth": conv(2 * hid, 2 * hid, 3, groups=2 * hid),
                             "conv_point": conv(hid, c, 1, bias=False),
                             "norm": norm(c)},
            }, c
        if spec.kind == "down":
            out = spec.out_channels
            cconv = out // 4 if spec.mode == "pixel_unshuffle" else out
            return {"conv": conv(cin, cconv)}, out
        if spec.kind == "up":
            out = spec.out_channels
            cconv = out if spec.mode == "interpolate" else out * 4
            return {"conv": conv(cin, cconv)}, out
        raise ValueError(spec.kind)

    # encoder
    if cfg.enc_stem.kind == "down":
        stem, ch = make_op(cfg.enc_stem, cfg.in_channels)
    else:
        stem, ch = conv(cfg.in_channels, cfg.enc_stem.out_channels), cfg.enc_stem.out_channels
    down_blocks = []
    for stage in cfg.encoder_ops:
        ops = []
        for spec in stage:
            p, ch = make_op(spec, ch)
            ops.append(p)
        down_blocks.append(ops)
    encoder = {"conv_in": stem, "down_blocks": down_blocks,
               "conv_out": conv(ch, cfg.latent_channels)}

    # decoder (params stored in config order; built deep->shallow)
    deepest = cfg.deepest_channels
    dec_conv_in = conv(cfg.latent_channels, deepest)
    ch = deepest
    up_blocks: List[List[dict]] = [[] for _ in cfg.decoder_ops]
    for i in cfg.exec_order():
        for spec in cfg.decoder_ops[i]:
            p, ch = make_op(spec, ch)
            up_blocks[i].append(p)
    if cfg.dec_head.kind == "conv":
        dec_out = conv(ch, cfg.in_channels)
    else:
        cconv = cfg.in_channels if cfg.dec_head.mode == "interpolate" else cfg.in_channels * 4
        dec_out = {"conv": conv(ch, cconv)}
    decoder = {"conv_in": dec_conv_in, "up_blocks": up_blocks,
               "norm_out": norm(ch), "conv_out": dec_out}
    return {"encoder": encoder, "decoder": decoder}
