"""Convert reference PyTorch checkpoints into wmar_tpu param pytrees.

Host-side only (numpy in, numpy out; loading ``.ckpt``/``.bin`` files uses
torch-cpu if present). Conventions:

* torch ``nn.Linear.weight [out, in]``  -> ``w [in, out]`` (transposed)
* torch ``nn.Conv2d.weight [O, I, kh, kw]`` -> flax ``kernel [kh, kw, I, O]``
* torch norm ``weight/bias`` -> ``scale/bias``

Checkpoint layouts handled:
* Taming ``net2net.ckpt`` — ``transformer.*`` (minGPT) +
  ``first_stage_model.*`` (VQGAN) in one state dict
  (``deps/taming/models/cond_transformer.py``).
* Standalone taming/chameleon VQGAN state dicts (``vqgan.ckpt``).
* MaskGit-VQGAN ``maskgit-vqgan-imagenet-f16-256.bin``.
* RAR generator ``rar_{b,l,xl,xxl}.bin``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from wmar_tpu.models.maskgit_vqgan import MaskGitVQConfig
from wmar_tpu.models.rar import RARConfig
from wmar_tpu.models.taming_gpt import GPTConfig
from wmar_tpu.models.vqgan import VQGANConfig

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a torch/safetensors/TorchScript checkpoint to numpy (host-side).

    TorchScript archives (e.g. the released ``syncmodel.jit.pt``,
    ``syncseal/models/scripted.py``) are opened with ``torch.jit.load`` and
    their state dict extracted."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    if not isinstance(sd, dict):  # torch.load of a scripted/eager module
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and isinstance(sd.get("model"), dict):
        sd = sd["model"]  # mimi .pth packaging (loaders.py:266-268)
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in sd.items()}


def _lin(sd: StateDict, prefix: str) -> dict:
    out = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    out["b"] = (
        sd[prefix + ".bias"]
        if prefix + ".bias" in sd
        else np.zeros(out["w"].shape[1], out["w"].dtype)
    )
    return out


def _ln(sd: StateDict, prefix: str) -> dict:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _conv(sd: StateDict, prefix: str) -> dict:
    k = np.ascontiguousarray(np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)))
    out = {"kernel": k}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _gn(sd: StateDict, prefix: str) -> dict:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


# ---------------------------------------------------------------------------
# Taming minGPT
# ---------------------------------------------------------------------------


def convert_taming_gpt(sd: StateDict, cfg: GPTConfig, prefix: str = "transformer.") -> dict:
    """``transformer.*`` of net2net.ckpt -> ``taming_gpt`` params."""
    p = prefix
    blocks = []
    for i in range(cfg.n_layer):
        bp = f"{p}blocks.{i}."
        blocks.append(
            {
                "ln1": _ln(sd, bp + "ln1"),
                "ln2": _ln(sd, bp + "ln2"),
                "attn": {
                    "q": _lin(sd, bp + "attn.query"),
                    "k": _lin(sd, bp + "attn.key"),
                    "v": _lin(sd, bp + "attn.value"),
                    "proj": _lin(sd, bp + "attn.proj"),
                },
                "mlp": {"fc": _lin(sd, bp + "mlp.0"), "proj": _lin(sd, bp + "mlp.2")},
            }
        )
    return {
        "tok_emb": sd[p + "tok_emb.weight"],
        "pos_emb": sd[p + "pos_emb"][0],
        "blocks": blocks,
        "ln_f": _ln(sd, p + "ln_f"),
        "head": np.ascontiguousarray(sd[p + "head.weight"].T),
    }


# ---------------------------------------------------------------------------
# Taming VQGAN
# ---------------------------------------------------------------------------


def _taming_resblock(sd: StateDict, tp: str, has_shortcut: bool) -> dict:
    out = {
        "GroupNorm_0": _gn(sd, tp + ".norm1"),
        "conv1": _conv(sd, tp + ".conv1"),
        "GroupNorm_1": _gn(sd, tp + ".norm2"),
        "conv2": _conv(sd, tp + ".conv2"),
    }
    if has_shortcut:
        out["nin_shortcut"] = _conv(sd, tp + ".nin_shortcut")
    return out


def _taming_attn(sd: StateDict, tp: str) -> dict:
    return {
        "GroupNorm_0": _gn(sd, tp + ".norm"),
        "q": _conv(sd, tp + ".q"),
        "k": _conv(sd, tp + ".k"),
        "v": _conv(sd, tp + ".v"),
        "proj_out": _conv(sd, tp + ".proj_out"),
    }


def _convert_taming_encoder(sd: StateDict, cfg: VQGANConfig, p: str) -> dict:
    out = {"conv_in": _conv(sd, p + "conv_in")}
    curr_res = cfg.resolution
    in_mult = (1,) + tuple(cfg.ch_mult)
    for i, mult in enumerate(cfg.ch_mult):
        block_in = cfg.ch * in_mult[i]
        block_out = cfg.ch * mult
        for j in range(cfg.num_res_blocks):
            tp = f"{p}down.{i}.block.{j}"
            out[f"down_{i}_block_{j}"] = _taming_resblock(sd, tp, block_in != block_out)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                out[f"down_{i}_attn_{j}"] = _taming_attn(sd, f"{p}down.{i}.attn.{j}")
        if i != cfg.num_resolutions - 1:
            out[f"down_{i}_downsample"] = {"conv": _conv(sd, f"{p}down.{i}.downsample.conv")}
            curr_res //= 2
    out["mid_block_1"] = _taming_resblock(sd, p + "mid.block_1", False)
    out["mid_attn_1"] = _taming_attn(sd, p + "mid.attn_1")
    out["mid_block_2"] = _taming_resblock(sd, p + "mid.block_2", False)
    out["GroupNorm_0"] = _gn(sd, p + "norm_out")
    out["conv_out"] = _conv(sd, p + "conv_out")
    return out


def _convert_taming_decoder(sd: StateDict, cfg: VQGANConfig, p: str) -> dict:
    out = {"conv_in": _conv(sd, p + "conv_in")}
    block_in = cfg.ch * cfg.ch_mult[-1]
    out["mid_block_1"] = _taming_resblock(sd, p + "mid.block_1", False)
    out["mid_attn_1"] = _taming_attn(sd, p + "mid.attn_1")
    out["mid_block_2"] = _taming_resblock(sd, p + "mid.block_2", False)
    curr_res = cfg.codes_per_side
    for i in reversed(range(cfg.num_resolutions)):
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            tp = f"{p}up.{i}.block.{j}"
            out[f"up_{i}_block_{j}"] = _taming_resblock(sd, tp, block_in != block_out)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                out[f"up_{i}_attn_{j}"] = _taming_attn(sd, f"{p}up.{i}.attn.{j}")
        if i != 0:
            out[f"up_{i}_upsample"] = {"conv": _conv(sd, f"{p}up.{i}.upsample.conv")}
            curr_res *= 2
    out["GroupNorm_0"] = _gn(sd, p + "norm_out")
    out["conv_out"] = _conv(sd, p + "conv_out")
    return out


def convert_taming_vqgan(sd: StateDict, cfg: VQGANConfig, prefix: str = "") -> dict:
    """State dict (optionally ``first_stage_model.``-prefixed) -> TamingVQGAN
    flax variables ``{"params": ...}``."""
    p = prefix
    params = {
        "encoder": _convert_taming_encoder(sd, cfg, p + "encoder."),
        "decoder": _convert_taming_decoder(sd, cfg, p + "decoder."),
        "quantize": {"embedding": sd[p + "quantize.embedding.weight"]},
        "quant_conv": _conv(sd, p + "quant_conv"),
        "post_quant_conv": _conv(sd, p + "post_quant_conv"),
    }
    return {"params": params}


# ---------------------------------------------------------------------------
# MaskGit VQGAN
# ---------------------------------------------------------------------------


def _mg_resblock(sd: StateDict, tp: str, has_shortcut: bool) -> dict:
    out = {
        "GroupNorm_0": _gn(sd, tp + ".norm1"),
        "conv1": _conv(sd, tp + ".conv1"),
        "GroupNorm_1": _gn(sd, tp + ".norm2"),
        "conv2": _conv(sd, tp + ".conv2"),
    }
    if has_shortcut:
        out["nin_shortcut"] = _conv(sd, tp + ".nin_shortcut")
    return out


def convert_maskgit_vqgan(sd: StateDict, cfg: MaskGitVQConfig, prefix: str = "") -> dict:
    p = prefix
    enc = {"conv_in": _conv(sd, p + "encoder.conv_in")}
    in_mult = (1,) + tuple(cfg.channel_mult)
    for i, mult in enumerate(cfg.channel_mult):
        block_in = cfg.hidden_channels * in_mult[i]
        block_out = cfg.hidden_channels * mult
        for j in range(cfg.num_res_blocks):
            enc[f"down_{i}_block_{j}"] = _mg_resblock(
                sd, f"{p}encoder.down.{i}.block.{j}", block_in != block_out
            )
            block_in = block_out
    mid_ch = cfg.hidden_channels * cfg.channel_mult[-1]
    for j in range(cfg.num_res_blocks):
        enc[f"mid_block_{j}"] = _mg_resblock(sd, f"{p}encoder.mid.{j}", False)
    enc["GroupNorm_0"] = _gn(sd, p + "encoder.norm_out")
    enc["conv_out"] = _conv(sd, p + "encoder.conv_out")

    dec = {"conv_in": _conv(sd, p + "decoder.conv_in")}
    for j in range(cfg.num_res_blocks):
        dec[f"mid_block_{j}"] = _mg_resblock(sd, f"{p}decoder.mid.{j}", False)
    block_in = mid_ch
    for i in reversed(range(cfg.num_resolutions)):
        block_out = cfg.hidden_channels * cfg.channel_mult[i]
        for j in range(cfg.num_res_blocks):
            dec[f"up_{i}_block_{j}"] = _mg_resblock(
                sd, f"{p}decoder.up.{i}.block.{j}", block_in != block_out
            )
            block_in = block_out
        if i != 0:
            dec[f"up_{i}_upsample_conv"] = _conv(sd, f"{p}decoder.up.{i}.upsample_conv")
    dec["GroupNorm_0"] = _gn(sd, p + "decoder.norm_out")
    dec["conv_out"] = _conv(sd, p + "decoder.conv_out")

    params = {
        "encoder": enc,
        "decoder": dec,
        "embedding": sd[p + "quantize.embedding.weight"],
    }
    return {"params": params}


# ---------------------------------------------------------------------------
# RAR
# ---------------------------------------------------------------------------


def convert_rar(sd: StateDict, cfg: RARConfig, prefix: str = "") -> dict:
    p = prefix
    blocks = []
    for i in range(cfg.depth):
        bp = f"{p}blocks.{i}."
        blocks.append(
            {
                "norm1": _ln(sd, bp + "norm1"),
                "norm2": _ln(sd, bp + "norm2"),
                "attn": {
                    "qkv": _lin(sd, bp + "attn.qkv"),
                    "q_norm": _ln(sd, bp + "attn.q_norm"),
                    "k_norm": _ln(sd, bp + "attn.k_norm"),
                    "proj": _lin(sd, bp + "attn.proj"),
                },
                "mlp": {"fc1": _lin(sd, bp + "mlp.fc1"), "fc2": _lin(sd, bp + "mlp.fc2")},
                "adaln": _lin(sd, bp + "adaLN_modulation.1"),
            }
        )
    return {
        "cls_token": sd[p + "cls_token"],
        "embeddings": sd[p + "embeddings.weight"],
        "pos_embed": sd[p + "pos_embed"][0],
        "target_aware_pos_embed": sd[p + "target_aware_pos_embed"][0],
        "timesteps_embeddings": sd[p + "timesteps_embeddings"][0],
        "blocks": blocks,
        "final_adaln": _lin(sd, p + "adaln_before_head.adaLN_modulation.1"),
        "lm_head": _lin(sd, p + "lm_head"),
    }


# ---------------------------------------------------------------------------
# Chameleon / Llama
# ---------------------------------------------------------------------------


def merge_chameleon_shards(shards):
    """Merge tensor-parallel ``consolidated.{rank:02}.pth`` shards
    (``deps/chameleon/inference/loader.py:37-71``).

    The published shards store UNFUSED attention/ffn weights — the
    reference's load hooks fuse wq/wk/wv -> wqkv and w1/w3 -> w13 *after*
    loading (``transformer.py:95,211``). Column-parallel weights (wq, wk,
    wv, w1, w3, output, tok_embeddings) concat on dim 0; row-parallel (wo,
    w2) concat on dim 1; norms are replicated. Pre-fused sharded keys
    (wqkv/w13), if ever encountered, are regrouped per component before
    concatenation — a naive dim-0 concat would interleave
    ``[q0,k0,v0,q1,...]`` (MHA equal-thirds assumed, which holds for the
    7B's 32=32 kv heads)."""
    if len(shards) == 1:
        return dict(shards[0])
    out = {}
    for key in shards[0]:
        parts = [s[key] for s in shards]
        if "wqkv" in key or "w13" in key:
            n = 3 if "wqkv" in key else 2
            groups = [np.split(np.asarray(p), n, axis=0) for p in parts]
            out[key] = np.concatenate(
                [np.concatenate([g[i] for g in groups], axis=0) for i in range(n)],
                axis=0,
            )
        elif any(t in key for t in (".wq.", ".wk.", ".wv.", ".w1.", ".w3.",
                                    "output.weight", "tok_embeddings")):
            out[key] = np.concatenate(parts, axis=0)
        elif any(t in key for t in (".wo.", ".w2.")):
            out[key] = np.concatenate(parts, axis=1)
        else:
            out[key] = parts[0]
    return out


def convert_chameleon_llama(sd: StateDict, cfg) -> dict:
    """Chameleon transformer state dict -> ``wmar_tpu.models.llama`` params.

    Handles both fused (wqkv / w13) and unfused (wq/wk/wv + w1/w3) layouts —
    the reference fuses at load time (``transformer.py:81-95``)."""
    d = cfg.dim
    kvd = cfg.kv_heads * cfg.head_dim

    def mat(name):
        return np.ascontiguousarray(sd[name].T)

    blocks = []
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        if p + "attention.wqkv.weight" in sd:
            wqkv = sd[p + "attention.wqkv.weight"]  # [d + 2*kvd, d]
            wq, wk, wv = wqkv[:d], wqkv[d : d + kvd], wqkv[d + kvd :]
        else:
            wq, wk, wv = (sd[p + f"attention.w{x}.weight"] for x in "qkv")
        if p + "feed_forward.w13.weight" in sd:
            w13 = sd[p + "feed_forward.w13.weight"]
            w1, w3 = np.split(w13, 2, axis=0)
        else:
            w1, w3 = sd[p + "feed_forward.w1.weight"], sd[p + "feed_forward.w3.weight"]
        blk = {
            "attention_norm": sd[p + "attention_norm.weight"],
            "ffn_norm": sd[p + "ffn_norm.weight"],
            "wq": np.ascontiguousarray(wq.T),
            "wk": np.ascontiguousarray(wk.T),
            "wv": np.ascontiguousarray(wv.T),
            "wo": mat(p + "attention.wo.weight"),
            "w1": np.ascontiguousarray(w1.T),
            "w3": np.ascontiguousarray(w3.T),
            "w2": mat(p + "feed_forward.w2.weight"),
        }
        if cfg.qk_normalization:
            blk["q_norm"] = {
                "scale": sd[p + "attention.q_normalization.weight"],
                "bias": sd[p + "attention.q_normalization.bias"],
            }
            blk["k_norm"] = {
                "scale": sd[p + "attention.k_normalization.weight"],
                "bias": sd[p + "attention.k_normalization.bias"],
            }
        blocks.append(blk)
    return {
        "tok_embeddings": sd["tok_embeddings.weight"],
        "blocks": blocks,
        "norm": sd["norm.weight"],
        "output": np.ascontiguousarray(sd["output.weight"].T),
    }


# ---------------------------------------------------------------------------
# Moshi temporal transformer (audio LM backbone)
# ---------------------------------------------------------------------------


def _moshi_norm(sd: StateDict, prefix: str) -> Array:
    """Moshi norms: LayerNorm stores ``.weight`` [d]; RMSNorm stores
    ``.alpha`` [1,1,d] (``transformer.py:58-74``). Both map to an rms scale."""
    if prefix + ".alpha" in sd:
        return np.asarray(sd[prefix + ".alpha"]).reshape(-1)
    return np.asarray(sd[prefix + ".weight"])


def convert_moshi_transformer(sd: StateDict, cfg, prefix: str = "transformer.") -> list:
    """Moshi ``StreamingTransformer`` layers -> llama-style block params.

    Mapping (``moshi/modules/transformer.py:430-560``, ``gating.py:25-60``):
    fused ``self_attn.in_proj_weight [3d, d]`` -> wq/wk/wv; gating FFN
    ``linear_in [2h, d]`` -> (w1 = first h rows = the activated branch,
    w3 = last h rows), ``linear_out`` -> w2; ``norm1/norm2`` (LayerNorm
    ``.weight`` or RMSNorm ``.alpha``) -> attention_norm/ffn_norm;
    LayerScale ``layer_scale_{1,2}.scale`` -> ls1/ls2."""
    d = cfg.dim
    blocks = []
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        in_proj = sd[p + "self_attn.in_proj_weight"]
        wq, wk, wv = in_proj[:d], in_proj[d : 2 * d], in_proj[2 * d :]
        lin_in = sd[p + "gating.linear_in.weight"]
        h = lin_in.shape[0] // 2
        blk = {
            "attention_norm": _moshi_norm(sd, p + "norm1"),
            "ffn_norm": _moshi_norm(sd, p + "norm2"),
            "wq": np.ascontiguousarray(wq.T),
            "wk": np.ascontiguousarray(wk.T),
            "wv": np.ascontiguousarray(wv.T),
            "wo": np.ascontiguousarray(sd[p + "self_attn.out_proj.weight"].T),
            "w1": np.ascontiguousarray(lin_in[:h].T),
            "w3": np.ascontiguousarray(lin_in[h:].T),
            "w2": np.ascontiguousarray(sd[p + "gating.linear_out.weight"].T),
        }
        if p + "layer_scale_1.scale" in sd:
            blk["ls1"] = sd[p + "layer_scale_1.scale"]
            blk["ls2"] = sd[p + "layer_scale_2.scale"]
        blocks.append(blk)
    return blocks


def convert_moshi_depformer(sd: StateDict, dep_layers: int, dep_dim: int, dep_q: int,
                            prefix: str = "depformer.") -> list:
    """Depformer layers with weights_per_step multi-linear weights.

    Layout (``transformer.py:322-339,382-412,528-540``): ``in_proj_weight``
    is ``[dep_q*3*d, d]`` (per-step fused qkv, step-major), ``out_proj``
    ``[dep_q*d, d]``; gating is a ModuleList ``gating.{s}.linear_{in,out}``.
    Output blocks stack per-step weights on a leading K axis.
    """
    d = dep_q and dep_dim
    blocks = []
    for i in range(dep_layers):
        p = f"{prefix}layers.{i}."
        in_proj = np.asarray(sd[p + "self_attn.in_proj_weight"]).reshape(dep_q, 3 * dep_dim, -1)
        out_proj = np.asarray(sd[p + "self_attn.out_proj.weight"]).reshape(dep_q, dep_dim, -1)
        wq = np.ascontiguousarray(in_proj[:, :dep_dim].transpose(0, 2, 1))
        wk = np.ascontiguousarray(in_proj[:, dep_dim : 2 * dep_dim].transpose(0, 2, 1))
        wv = np.ascontiguousarray(in_proj[:, 2 * dep_dim :].transpose(0, 2, 1))
        w1s, w3s, w2s = [], [], []
        for s in range(dep_q):
            lin_in = np.asarray(sd[f"{p}gating.{s}.linear_in.weight"])
            h = lin_in.shape[0] // 2
            w1s.append(lin_in[:h].T)
            w3s.append(lin_in[h:].T)
            w2s.append(np.asarray(sd[f"{p}gating.{s}.linear_out.weight"]).T)
        blocks.append({
            "attention_norm": _moshi_norm(sd, p + "norm1"),
            "ffn_norm": _moshi_norm(sd, p + "norm2"),
            "wq": wq, "wk": wk, "wv": wv,
            "wo": np.ascontiguousarray(out_proj.transpose(0, 2, 1)),
            "w1": np.ascontiguousarray(np.stack(w1s)),
            "w3": np.ascontiguousarray(np.stack(w3s)),
            "w2": np.ascontiguousarray(np.stack(w2s)),
        })
    return blocks


def convert_moshi_lm(sd: StateDict, cfg) -> dict:
    """Full Moshi LMModel checkpoint -> ``wmar_tpu.audio.lm`` params.

    Covers the real layout (``moshi/models/lm.py:143-221``): text_emb,
    ``emb.{k}`` input audio embeddings (n_q of them), transformer layers,
    out_norm + text_linear, per-codebook ``depformer_in.{k}``,
    ``depformer_text_emb``/``depformer_emb.{k}``, weights_per-step depformer
    layers, and the ``linears.{k}`` output heads.
    """
    card, text_card = cfg.audio_vocab, cfg.text_vocab
    dep_q = cfg.n_audio_streams
    tvocab = cfg.temporal_cfg().vocab_size  # placeholder size (unused path)
    temporal = {
        "blocks": convert_moshi_transformer(sd, cfg.temporal_cfg(), "transformer."),
        "norm": _moshi_norm(sd, "out_norm"),
        # unused by the audio path but required by llama params layout
        "tok_embeddings": np.zeros((tvocab, cfg.dim), np.float32),
        "output": np.zeros((cfg.dim, tvocab), np.float32),
    }
    n_in = 1
    while f"depformer_in.{n_in}.weight" in sd:
        n_in += 1
    dep_in = np.stack(
        [np.asarray(sd[f"depformer_in.{k}.weight"]).T for k in range(n_in)]
    )
    audio_emb = np.concatenate(
        [np.asarray(sd[f"emb.{k}.weight"]) for k in range(cfg.num_inputs)], axis=0
    )
    dep_tok = np.zeros(
        (dep_q * (card + 1) + text_card + 1, cfg.dep_dim), np.float32
    )
    for k in range(dep_q - 1):
        dep_tok[k * (card + 1) : (k + 1) * (card + 1)] = sd[f"depformer_emb.{k}.weight"]
    dep_tok[dep_q * (card + 1) :] = sd["depformer_text_emb.weight"]
    dep = {
        "blocks": convert_moshi_depformer(sd, cfg.dep_layers, cfg.dep_dim, dep_q),
        "norm": (np.asarray(sd["depformer.norm.alpha"]).reshape(-1)
                 if "depformer.norm.alpha" in sd
                 else _moshi_norm(sd, "depformer.norm")
                 if ("depformer.norm.weight" in sd or "depformer.norm.alpha" in sd)
                 else np.ones((cfg.dep_dim,), np.float32)),
        "tok_embeddings": np.zeros((cfg.dep_cfg().vocab_size, cfg.dep_dim), np.float32),
        "output": np.zeros((cfg.dep_dim, cfg.dep_cfg().vocab_size), np.float32),
    }
    return {
        "temporal": temporal,
        "dep": dep,
        "text_emb": np.asarray(sd["text_emb.weight"]),
        "audio_emb": audio_emb,
        "text_head": np.ascontiguousarray(sd["text_linear.weight"].T),
        "dep_in": dep_in,
        "dep_tok_emb": dep_tok,
        "dep_heads": np.stack(
            [np.asarray(sd[f"linears.{k}.weight"]).T for k in range(dep_q)]
        ),
    }


# ---------------------------------------------------------------------------
# RCC delta conversion (the reference's published finetune artifacts)
# ---------------------------------------------------------------------------


def convert_vqgan_delta(base_sd: StateDict, delta_sd: StateDict, part: str,
                        convert_fn, stage_prefix: str = "") -> dict:
    """Reference RCC delta -> delta pytree for the converted params subtree.

    The reference publishes finetunes as additive state-dict deltas with
    encoder/decoder-relative keys (``wmar/utils/utils.py:215-227``), applied
    via ``update_weights(model.encoder, path)`` (``generate.py:327-332``).
    We compute ``convert(base + delta) - convert(base)``, which is exact for
    any converter (transposes and fused mappings alike) and yields a pytree
    consumable by ``checkpoint.load_and_apply_delta`` /
    ``generate.py --{encoder,decoder}_ft_ckpt``.
    """
    import jax

    module_prefix = f"{stage_prefix}{part}."
    new_sd = dict(base_sd)
    for k, v in delta_sd.items():
        key = module_prefix + k
        if key not in base_sd:
            raise KeyError(f"delta key {k!r} has no base weight {key!r}")
        new_sd[key] = np.asarray(base_sd[key]) + np.asarray(v)
    base_tree = convert_fn(base_sd)["params"][part]
    new_tree = convert_fn(new_sd)["params"][part]
    return jax.tree.map(lambda a, b: np.asarray(b) - np.asarray(a), base_tree, new_tree)
