"""Torch-oracle parity for real-Moshi layer structures and the full LM
converter (``moshi/models/lm.py:143-221``, ``modules/transformer.py``,
``modules/gating.py``)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from wmar_tpu.audio.lm import (
    MOSHI_V01,
    MoshiConfig,
    MoshiGen,
    _dep_step,
    _temporal_step,
    gating_hidden,
    init_moshi_params,
)
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.utils.convert import (
    convert_moshi_depformer,
    convert_moshi_lm,
    convert_moshi_transformer,
)

TINY = MoshiConfig(
    n_audio_streams=2, audio_vocab=16, text_vocab=24,
    dim=16, n_layers=1, n_heads=2, dep_dim=8, dep_layers=1, dep_heads=2,
    delays=(0, 1), n_q=3, hidden_scale=4.125,
    depformer_multi_linear=True, depformer_weights_per_step=True,
    depformer_pos_emb="none",
)


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.alpha = nn.Parameter(torch.full((1, 1, dim), 1.0))

    def forward(self, x):
        var = (x**2).mean(dim=-1, keepdim=True)
        return self.alpha * (x * torch.rsqrt(var + self.eps))


class Gating(nn.Module):
    """ActivationGating with silu (gating.py:25-62)."""

    def __init__(self, dim, dim_feedforward):
        super().__init__()
        hidden = gating_hidden(dim, dim_feedforward)
        self.linear_in = nn.Linear(dim, 2 * hidden, bias=False)
        self.linear_out = nn.Linear(hidden, dim, bias=False)

    def forward(self, x):
        x = self.linear_in(x)
        B, T, _ = x.shape
        x = x.view(B, T, 2, -1)
        x = F.silu(x[..., 0, :]) * x[..., 1, :]
        return self.linear_out(x)


class MoshiLayer(nn.Module):
    """StreamingTransformerLayer at T=1 (attention over a single key is the
    identity on v, so rope cancels)."""

    def __init__(self, d, heads, ff):
        super().__init__()
        in_proj = nn.Linear(d, 3 * d, bias=False)
        self.self_attn = nn.Module()
        self.self_attn.in_proj_weight = in_proj.weight
        self.self_attn.out_proj = nn.Linear(d, d, bias=False)
        self.norm1 = RMSNorm(d)
        self.norm2 = RMSNorm(d)
        self.gating = Gating(d, ff)

    def forward(self, x):  # x: [B, 1, d]
        h = self.norm1(x)
        qkv = F.linear(h, self.self_attn.in_proj_weight)
        d = x.shape[-1]
        v = qkv[..., 2 * d :]
        x = x + self.self_attn.out_proj(v)
        x = x + self.gating(self.norm2(x))
        return x


def test_temporal_block_parity():
    """One temporal block (rms-alpha norms + fused qkv + silu gating) through
    convert_moshi_transformer matches the torch layer at T=1."""
    torch.manual_seed(0)
    d, heads, ff = 16, 2, int(4.125 * 16)
    layer = MoshiLayer(d, heads, ff).eval()

    class Wrap(nn.Module):
        def __init__(self):
            super().__init__()
            t = nn.Module()
            t.layers = nn.ModuleList([layer])
            self.transformer = t

    sd = {k: v.detach().numpy() for k, v in Wrap().state_dict().items()}
    cfg = MoshiConfig(dim=d, n_layers=1, n_heads=heads, hidden_scale=4.125)
    blocks = convert_moshi_transformer(sd, cfg.temporal_cfg(), "transformer.")
    params = {"blocks": jax.tree.map(jnp.asarray, blocks),
              "norm": jnp.ones((d,))}

    x = torch.randn(2, 1, d)
    with torch.no_grad():
        ref = layer(x)  # pre-out_norm
    # our _temporal_step also applies the final norm; compare pre-norm by
    # setting norm scale to 1 and re-normalizing the torch side identically
    cache = KVCache.zeros(1, 2, heads, 4, d // heads)
    out, _ = _temporal_step(params, cfg, jnp.asarray(x.numpy()[:, 0]), cache, 0)
    ref_rms = ref / torch.sqrt((ref**2).mean(-1, keepdim=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref_rms[:, 0].numpy(), atol=2e-5)


def test_depformer_multilinear_slicing():
    """weights_per_step depformer: converted [K, ...] stacks reproduce the
    reference's multi_linear row slicing (utils/quantize.py:35-60)."""
    torch.manual_seed(1)
    dep_q, d = 3, 8
    ff = int(4.125 * d)
    hidden = gating_hidden(d, ff)
    in_proj = torch.randn(dep_q * 3 * d, d) * 0.1
    out_proj = torch.randn(dep_q * d, d) * 0.1
    sd = {
        "depformer.layers.0.self_attn.in_proj_weight": in_proj.numpy(),
        "depformer.layers.0.self_attn.out_proj.weight": out_proj.numpy(),
        "depformer.layers.0.norm1.alpha": np.ones((1, 1, d), np.float32),
        "depformer.layers.0.norm2.alpha": np.ones((1, 1, d), np.float32),
    }
    for s in range(dep_q):
        sd[f"depformer.layers.0.gating.{s}.linear_in.weight"] = (
            0.1 * torch.randn(2 * hidden, d)
        ).numpy()
        sd[f"depformer.layers.0.gating.{s}.linear_out.weight"] = (
            0.1 * torch.randn(d, hidden)
        ).numpy()
    blocks = convert_moshi_depformer(sd, 1, d, dep_q)
    blk = blocks[0]
    x = torch.randn(2, 1, d)

    for s in range(dep_q):
        # reference multi_linear: rows [s*chout : (s+1)*chout]
        ref_qkv = F.linear(x, in_proj[s * 3 * d : (s + 1) * 3 * d])
        q_ref = ref_qkv[..., :d]
        ours_q = x.numpy()[:, 0] @ np.asarray(blk["wq"][s])
        np.testing.assert_allclose(ours_q, q_ref[:, 0].numpy(), atol=1e-5)
        v_ref = ref_qkv[..., 2 * d :]
        attn_ref = F.linear(v_ref, out_proj[s * d : (s + 1) * d])
        ours_o = (x.numpy()[:, 0] @ np.asarray(blk["wv"][s])) @ np.asarray(blk["wo"][s])
        np.testing.assert_allclose(ours_o, attn_ref[:, 0].numpy(), atol=1e-5)
        lin_in = sd[f"depformer.layers.0.gating.{s}.linear_in.weight"]
        g_ref = F.linear(
            torch.from_numpy(
                F.silu(torch.from_numpy(x.numpy() @ lin_in[:hidden].T)).numpy()
                * (x.numpy() @ lin_in[hidden:].T)
            ),
            torch.from_numpy(sd[f"depformer.layers.0.gating.{s}.linear_out.weight"]),
        )
        ours_g = (
            np.asarray(jax.nn.silu(x.numpy() @ np.asarray(blk["w1"][s])))
            * (x.numpy() @ np.asarray(blk["w3"][s]))
        ) @ np.asarray(blk["w2"][s])
        np.testing.assert_allclose(ours_g, g_ref.numpy(), atol=1e-5)


def _tiny_moshi_sd(cfg: MoshiConfig):
    """Full tiny checkpoint with the real key layout."""
    torch.manual_seed(2)
    sd = {}
    d, dd = cfg.dim, cfg.dep_dim
    card, text = cfg.audio_vocab, cfg.text_vocab
    hidden = gating_hidden(d, int(cfg.hidden_scale * d))
    dhidden = gating_hidden(dd, int(cfg.hidden_scale * dd))
    r = lambda *s: (0.1 * torch.randn(*s)).numpy()
    for i in range(cfg.n_layers):
        p = f"transformer.layers.{i}."
        sd[p + "self_attn.in_proj_weight"] = r(3 * d, d)
        sd[p + "self_attn.out_proj.weight"] = r(d, d)
        sd[p + "norm1.alpha"] = np.ones((1, 1, d), np.float32)
        sd[p + "norm2.alpha"] = np.ones((1, 1, d), np.float32)
        sd[p + "gating.linear_in.weight"] = r(2 * hidden, d)
        sd[p + "gating.linear_out.weight"] = r(d, hidden)
    for i in range(cfg.dep_layers):
        p = f"depformer.layers.{i}."
        K = cfg.n_audio_streams
        sd[p + "self_attn.in_proj_weight"] = r(K * 3 * dd, dd)
        sd[p + "self_attn.out_proj.weight"] = r(K * dd, dd)
        sd[p + "norm1.alpha"] = np.ones((1, 1, dd), np.float32)
        sd[p + "norm2.alpha"] = np.ones((1, 1, dd), np.float32)
        for s in range(K):
            sd[p + f"gating.{s}.linear_in.weight"] = r(2 * dhidden, dd)
            sd[p + f"gating.{s}.linear_out.weight"] = r(dd, dhidden)
    sd["out_norm.alpha"] = np.ones((1, 1, d), np.float32)
    sd["text_emb.weight"] = r(text + 1, d)
    sd["text_linear.weight"] = r(text, d)
    for k in range(cfg.num_inputs):
        sd[f"emb.{k}.weight"] = r(card + 1, d)
    for k in range(cfg.n_audio_streams):
        sd[f"depformer_in.{k}.weight"] = r(dd, d)
        sd[f"linears.{k}.weight"] = r(card, dd)
    for k in range(cfg.n_audio_streams - 1):
        sd[f"depformer_emb.{k}.weight"] = r(card + 1, dd)
    sd["depformer_text_emb.weight"] = r(text + 1, dd)
    return sd


def test_full_lm_converter_and_generation():
    """convert_moshi_lm consumes the complete real layout and the converted
    params drive watermark-fused generation end-to-end."""
    sd = _tiny_moshi_sd(TINY)
    params = jax.tree.map(jnp.asarray, convert_moshi_lm(sd, TINY))
    # shape-compat with random init (so msgpack checkpoints interop)
    inited = init_moshi_params(jax.random.PRNGKey(0), TINY)
    conv_shapes = jax.tree.map(lambda a: np.shape(a), params)
    init_shapes = jax.tree.map(lambda a: np.shape(a), inited)
    assert conv_shapes == init_shapes

    gen = MoshiGen(params, TINY)
    text, audio = gen.generate(4, jax.random.PRNGKey(0), batch=1)
    assert text.shape == (1, 4)
    assert audio.shape == (1, TINY.n_audio_streams, 4)
    assert int(audio.max()) < TINY.audio_vocab


def test_converter_conserves_parameters():
    """Every checkpoint weight lands in the converted tree: total element
    count matches (synthetic zero placeholders and the one unused
    depformer_emb slot in dep_tok_emb excluded)."""
    sd = _tiny_moshi_sd(TINY)
    params = convert_moshi_lm(sd, TINY)
    sd_elems = sum(v.size for v in sd.values())
    conv_elems = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(params) if hasattr(l, "shape")
    )
    synthetic = (
        2 * (8 * TINY.dim)  # temporal tok_embeddings + output placeholders
        + 2 * (8 * TINY.dep_dim)  # dep placeholders
        + TINY.dep_dim  # synthetic dep norm (no depformer.norm key in sd)
        # dep_tok_emb padding: table sized K*(card+1)+text+1 but only
        # (K-1)*(card+1) + text+1 slots come from the checkpoint
        + (TINY.audio_vocab + 1) * TINY.dep_dim
    )
    assert conv_elems - synthetic == sd_elems, (conv_elems, synthetic, sd_elems)


def test_moshi_v01_geometry():
    """MOSHI_V01 expresses the published 7B geometry (loaders.py:81-111)."""
    assert MOSHI_V01.dim == 4096 and MOSHI_V01.n_layers == 32
    assert MOSHI_V01.n_q == 16 and MOSHI_V01.n_audio_streams == 8
    assert MOSHI_V01.dep_dim == 1024 and MOSHI_V01.dep_layers == 6
    assert MOSHI_V01.ffn_hidden == (2 * int(4.125 * 4096)) // 3
    assert MOSHI_V01.dep_ffn_hidden == (2 * int(4.125 * 1024)) // 3
    assert MOSHI_V01.depformer_pos_emb == "none"
    # gating rule edge: ff == 4d uses 21d/8
    assert gating_hidden(64, 256) == (21 * 64) // 8
    assert gating_hidden(64, 200) == (2 * 200) // 3
