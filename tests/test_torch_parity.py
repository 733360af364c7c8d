"""Numerical parity with the PyTorch reference architectures.

Builds tiny torch models with the reference's exact layer structure and
state-dict naming (minGPT / taming VQGAN / RAR-style blocks), converts the
weights with ``wmar_tpu.utils.convert``, and checks our JAX forward passes
reproduce the torch outputs — the foundation for bit-exact greedy-decode
parity with published checkpoints.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wmar_tpu.models.taming_gpt import GPTConfig, gpt_forward  # noqa: E402
from wmar_tpu.models.vqgan import TamingVQGAN, VQGANConfig  # noqa: E402
from wmar_tpu.utils import convert  # noqa: E402

# ---------------------------------------------------------------------------
# Tiny torch minGPT with the reference's module names (mingpt.py)
# ---------------------------------------------------------------------------


class TorchBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ln1 = tnn.LayerNorm(d)
        self.ln2 = tnn.LayerNorm(d)
        self.attn = tnn.Module()
        self.attn.key = tnn.Linear(d, d)
        self.attn.query = tnn.Linear(d, d)
        self.attn.value = tnn.Linear(d, d)
        self.attn.proj = tnn.Linear(d, d)
        self.attn.n_head = h
        self.mlp = tnn.Sequential(tnn.Linear(d, 4 * d), tnn.GELU(), tnn.Linear(4 * d, d))

    def forward(self, x):
        b, t, c = x.shape
        hn = self.ln1(x)
        nh = self.attn.n_head
        k = self.attn.key(hn).view(b, t, nh, c // nh).transpose(1, 2)
        q = self.attn.query(hn).view(b, t, nh, c // nh).transpose(1, 2)
        v = self.attn.value(hn).view(b, t, nh, c // nh).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / (c // nh) ** 0.5
        mask = torch.tril(torch.ones(t, t, dtype=torch.bool))
        att = att.masked_fill(~mask, float("-inf")).softmax(-1)
        y = (att @ v).transpose(1, 2).reshape(b, t, c)
        x = x + self.attn.proj(y)
        return x + self.mlp(self.ln2(x))


class TorchGPT(tnn.Module):
    def __init__(self, vocab, block_size, n_layer, n_head, d):
        super().__init__()
        self.tok_emb = tnn.Embedding(vocab, d)
        self.pos_emb = tnn.Parameter(torch.zeros(1, block_size, d))
        self.blocks = tnn.ModuleList([TorchBlock(d, n_head) for _ in range(n_layer)])
        self.ln_f = tnn.LayerNorm(d)
        self.head = tnn.Linear(d, vocab, bias=False)

    def forward(self, idx):
        x = self.tok_emb(idx) + self.pos_emb[:, : idx.shape[1]]
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.ln_f(x))


def test_gpt_conversion_parity():
    torch.manual_seed(0)
    cfg = GPTConfig(vocab_size=32, block_size=16, n_layer=2, n_head=2, n_embd=16)
    tm = TorchGPT(32, 16, 2, 2, 16).eval()
    for p in tm.parameters():
        p.data.normal_(0, 0.3)
    sd = {f"transformer.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    # reference names mlp layers "mlp.0"/"mlp.2" — Sequential already does.
    params = convert.convert_taming_gpt(sd, cfg)
    tokens = np.array([[1, 5, 9, 2, 30, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(tokens)).numpy()
    ours, _ = gpt_forward(params, cfg, jnp.asarray(tokens.astype(np.int32)), cache=None)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_gpt_greedy_decode_parity():
    """Greedy token trajectories agree between torch and the JAX cache path."""
    torch.manual_seed(1)
    cfg = GPTConfig(vocab_size=32, block_size=32, n_layer=2, n_head=2, n_embd=16)
    tm = TorchGPT(32, 32, 2, 2, 16).eval()
    for p in tm.parameters():
        p.data.normal_(0, 0.3)
    sd = {f"transformer.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert.convert_taming_gpt(sd, cfg))

    # torch greedy rollout (full re-forward each step)
    toks = [3]
    with torch.no_grad():
        for _ in range(10):
            logits = tm(torch.tensor([toks]))[0, -1]
            toks.append(int(logits.argmax()))

    # jax greedy rollout through the KV cache
    from wmar_tpu.engine.decode import SamplerConfig, decode_tokens
    from wmar_tpu.models.taming_gpt import make_step_fn, prefill

    cond = jnp.array([[3]], dtype=jnp.int32)
    init_logits, cache = prefill(params, cfg, cond, max_len=16)
    step_fn = make_step_fn(params, cfg, cond_len=1)
    out, _ = decode_tokens(
        step_fn, cache, init_logits, 10, jax.random.PRNGKey(0), SamplerConfig(greedy=True)
    )
    np.testing.assert_array_equal(np.asarray(out)[0], np.asarray(toks[1:]))


# ---------------------------------------------------------------------------
# Tiny torch taming VQGAN (encoder/decoder/quantizer naming per vqgan.py)
# ---------------------------------------------------------------------------


def _t_norm(c):
    return tnn.GroupNorm(32, c, eps=1e-6)


class TResBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _t_norm(cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _t_norm(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = tnn.Conv2d(cin, cout, 1)
        self.cin, self.cout = cin, cout

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.cin != self.cout:
            x = self.nin_shortcut(x)
        return x + h


class TAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _t_norm(c)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        b, c, hh, ww = h.shape
        q = self.q(h).reshape(b, c, -1).permute(0, 2, 1)
        k = self.k(h).reshape(b, c, -1)
        v = self.v(h).reshape(b, c, -1).permute(0, 2, 1)
        att = torch.softmax(q @ k * c**-0.5, dim=-1)
        out = (att @ v).permute(0, 2, 1).reshape(b, c, hh, ww)
        return x + self.proj_out(out)


class TDown(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


CFG = VQGANConfig(
    resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
    z_channels=32, n_embed=16, embed_dim=8,
)


class TorchVQGAN(tnn.Module):
    """Tiny reference-named VQGAN: ch 32, mult (1,2), 1 res block, attn@8."""

    def __init__(self):
        super().__init__()
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, 32, 3, padding=1)
        d0 = tnn.Module()
        d0.block = tnn.ModuleList([TResBlock(32, 32)])
        d0.attn = tnn.ModuleList([])
        d0.downsample = TDown(32)
        d1 = tnn.Module()
        d1.block = tnn.ModuleList([TResBlock(32, 64)])
        d1.attn = tnn.ModuleList([TAttn(64)])
        enc.down = tnn.ModuleList([d0, d1])
        enc.mid = tnn.Module()
        enc.mid.block_1 = TResBlock(64, 64)
        enc.mid.attn_1 = TAttn(64)
        enc.mid.block_2 = TResBlock(64, 64)
        enc.norm_out = _t_norm(64)
        enc.conv_out = tnn.Conv2d(64, 32, 3, padding=1)
        self.encoder = enc

        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(32, 64, 3, padding=1)
        dec.mid = tnn.Module()
        dec.mid.block_1 = TResBlock(64, 64)
        dec.mid.attn_1 = TAttn(64)
        dec.mid.block_2 = TResBlock(64, 64)
        u1 = tnn.Module()
        u1.block = tnn.ModuleList([TResBlock(64, 64), TResBlock(64, 64)])
        u1.attn = tnn.ModuleList([TAttn(64), TAttn(64)])
        u1.upsample = TUp(64)
        u0 = tnn.Module()
        u0.block = tnn.ModuleList([TResBlock(64, 32), TResBlock(32, 32)])
        u0.attn = tnn.ModuleList([])
        dec.up = tnn.ModuleList([u0, u1])  # indexed like the reference
        dec.norm_out = _t_norm(32)
        dec.conv_out = tnn.Conv2d(32, 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = tnn.Conv2d(32, 8, 1)
        self.post_quant_conv = tnn.Conv2d(8, 32, 1)
        self.quantize = tnn.Module()
        self.quantize.embedding = tnn.Embedding(16, 8)

    def encode_latent(self, x):
        e = self.encoder
        h = e.conv_in(x)
        h = e.down[0].block[0](h)
        h = e.down[0].downsample(h)
        h = e.down[1].block[0](h)
        h = e.down[1].attn[0](h)
        h = e.mid.block_1(h)
        h = e.mid.attn_1(h)
        h = e.mid.block_2(h)
        h = e.conv_out(F.silu(e.norm_out(h)))
        return self.quant_conv(h)

    def decode_latent(self, zq):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(zq))
        h = d.mid.block_1(h)
        h = d.mid.attn_1(h)
        h = d.mid.block_2(h)
        h = d.up[1].block[0](h)
        h = d.up[1].attn[0](h)
        h = d.up[1].block[1](h)
        h = d.up[1].attn[1](h)
        h = d.up[1].upsample(h)
        h = d.up[0].block[0](h)
        h = d.up[0].block[1](h)
        return d.conv_out(F.silu(d.norm_out(h)))


@pytest.fixture(scope="module")
def torch_vqgan():
    torch.manual_seed(0)
    m = TorchVQGAN().eval()
    for p in m.parameters():
        p.data.normal_(0, 0.1)
    return m


def test_vqgan_encoder_parity(torch_vqgan):
    sd = {k: v.detach().numpy() for k, v in torch_vqgan.state_dict().items()}
    variables = convert.convert_taming_vqgan(sd, CFG)
    model = TamingVQGAN(CFG)
    x = np.random.default_rng(0).uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_vqgan.encode_latent(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = model.apply(variables, jnp.asarray(x), method=TamingVQGAN.encode_latent)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=5e-4, atol=5e-4
    )


def test_vqgan_decoder_parity(torch_vqgan):
    sd = {k: v.detach().numpy() for k, v in torch_vqgan.state_dict().items()}
    variables = convert.convert_taming_vqgan(sd, CFG)
    model = TamingVQGAN(CFG)
    codes = np.random.default_rng(1).integers(0, 16, size=(1, 64)).astype(np.int32)
    with torch.no_grad():
        emb = torch_vqgan.quantize.embedding(torch.from_numpy(codes.astype(np.int64)))
        zq = emb.reshape(1, 8, 8, 8).permute(0, 3, 1, 2)
        ref = torch_vqgan.decode_latent(zq).numpy()
    ours = model.apply(variables, jnp.asarray(codes), method=TamingVQGAN.decode_codes)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=5e-4, atol=5e-4
    )


def test_vqgan_codes_parity(torch_vqgan):
    """Nearest-codebook token assignment agrees with torch argmin."""
    sd = {k: v.detach().numpy() for k, v in torch_vqgan.state_dict().items()}
    variables = convert.convert_taming_vqgan(sd, CFG)
    model = TamingVQGAN(CFG)
    x = np.random.default_rng(2).uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        z = torch_vqgan.encode_latent(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        flat = z.permute(0, 2, 3, 1).reshape(-1, 8)
        e = torch_vqgan.quantize.embedding.weight
        d = (flat**2).sum(1, keepdim=True) + (e**2).sum(1) - 2 * flat @ e.T
        ref = d.argmin(1).reshape(2, -1).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), method=TamingVQGAN.encode_codes))
    assert (ours == ref).mean() > 0.99  # ties may break differently in fp32


# ---------------------------------------------------------------------------
# Chameleon-style Llama block (fused wqkv/w13, qk-LayerNorm, RoPE)
# ---------------------------------------------------------------------------


def _torch_rope(x, positions, theta=10000.0):
    # x: [B, T, H, D]; adjacent-pair rotation
    b, t, h, d = x.shape
    freqs = 1.0 / (theta ** (torch.arange(0, d, 2, dtype=torch.float64) / d))
    ang = positions[:, :, None].double() * freqs[None, None]
    cos, sin = torch.cos(ang)[:, :, None], torch.sin(ang)[:, :, None]
    xr = x.double().reshape(b, t, h, d // 2, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    out = torch.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], dim=-1)
    return out.reshape(b, t, h, d).float()


def test_chameleon_llama_conversion_parity():
    from wmar_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward
    from wmar_tpu.engine.kvcache import KVCache

    torch.manual_seed(0)
    cfg = LlamaConfig(dim=32, n_layers=2, n_heads=4, vocab_size=64,
                      multiple_of=16, qk_normalization=True)
    d, hd, ffn = cfg.dim, cfg.head_dim, cfg.ffn_hidden

    # Build a reference-shaped state dict with fused weights.
    sd = {}
    sd["tok_embeddings.weight"] = np.random.default_rng(0).normal(0, 0.1, (64, d)).astype(np.float32)
    sd["norm.weight"] = np.random.default_rng(1).uniform(0.5, 1.5, (d,)).astype(np.float32)
    sd["output.weight"] = np.random.default_rng(2).normal(0, 0.1, (64, d)).astype(np.float32)
    rng = np.random.default_rng(3)
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        sd[p + "attention.wqkv.weight"] = rng.normal(0, 0.1, (3 * d, d)).astype(np.float32)
        sd[p + "attention.wo.weight"] = rng.normal(0, 0.1, (d, d)).astype(np.float32)
        sd[p + "feed_forward.w13.weight"] = rng.normal(0, 0.1, (2 * ffn, d)).astype(np.float32)
        sd[p + "feed_forward.w2.weight"] = rng.normal(0, 0.1, (d, ffn)).astype(np.float32)
        sd[p + "attention_norm.weight"] = rng.uniform(0.5, 1.5, (d,)).astype(np.float32)
        sd[p + "ffn_norm.weight"] = rng.uniform(0.5, 1.5, (d,)).astype(np.float32)
        sd[p + "attention.q_normalization.weight"] = rng.uniform(0.5, 1.5, (hd,)).astype(np.float32)
        sd[p + "attention.q_normalization.bias"] = rng.normal(0, 0.05, (hd,)).astype(np.float32)
        sd[p + "attention.k_normalization.weight"] = rng.uniform(0.5, 1.5, (hd,)).astype(np.float32)
        sd[p + "attention.k_normalization.bias"] = rng.normal(0, 0.05, (hd,)).astype(np.float32)

    # Torch oracle forward.
    def oracle(tokens):
        x = torch.from_numpy(sd["tok_embeddings.weight"][tokens])[None]  # [1, T, d]
        pos = torch.arange(x.shape[1])[None]
        for i in range(cfg.n_layers):
            p = f"layers.{i}."
            def rms(v, w):
                var = (v.double() ** 2).mean(-1, keepdim=True)
                return (v.double() / torch.sqrt(var + 1e-5)).float() * torch.from_numpy(w)
            h = rms(x, sd[p + "attention_norm.weight"])
            wqkv = torch.from_numpy(sd[p + "attention.wqkv.weight"])
            qkv = h @ wqkv.T
            q, k, v = qkv[..., :d], qkv[..., d:2*d], qkv[..., 2*d:]
            def headify(z):
                return z.reshape(1, -1, cfg.n_heads, hd)
            q, k, v = headify(q), headify(k), headify(v)
            def lnh(z, wkey, bkey):
                w = torch.from_numpy(sd[p + wkey]); b_ = torch.from_numpy(sd[p + bkey])
                mu = z.mean(-1, keepdim=True); var = ((z - mu) ** 2).mean(-1, keepdim=True)
                return (z - mu) / torch.sqrt(var + 1e-5) * w + b_
            q = lnh(q, "attention.q_normalization.weight", "attention.q_normalization.bias")
            k = lnh(k, "attention.k_normalization.weight", "attention.k_normalization.bias")
            q = _torch_rope(q, pos); k = _torch_rope(k, pos)
            q, k, v = (z.transpose(1, 2) for z in (q, k, v))
            att = (q @ k.transpose(-2, -1)) / hd ** 0.5
            t = att.shape[-1]
            mask = torch.tril(torch.ones(t, t, dtype=torch.bool))
            att = att.masked_fill(~mask, float("-inf")).softmax(-1)
            o = (att @ v).transpose(1, 2).reshape(1, -1, d)
            x = x + o @ torch.from_numpy(sd[p + "attention.wo.weight"]).T
            h2 = rms(x, sd[p + "ffn_norm.weight"])
            w13 = torch.from_numpy(sd[p + "feed_forward.w13.weight"])
            w1, w3 = w13[:ffn], w13[ffn:]
            gate = torch.nn.functional.silu(h2 @ w1.T) * (h2 @ w3.T)
            x = x + gate @ torch.from_numpy(sd[p + "feed_forward.w2.weight"]).T
        x = (x.double() / torch.sqrt((x.double() ** 2).mean(-1, keepdim=True) + 1e-5)).float()
        x = x * torch.from_numpy(sd["norm.weight"])
        return (x @ torch.from_numpy(sd["output.weight"]).T).numpy()

    from wmar_tpu.utils.convert import convert_chameleon_llama

    params = jax.tree.map(jnp.asarray, convert_chameleon_llama(sd, cfg))
    tokens = np.array([3, 9, 17, 40], dtype=np.int32)
    ref = oracle(tokens)
    cache = KVCache.zeros(cfg.n_layers, 1, cfg.n_heads, 8, cfg.head_dim)
    ours, _ = llama_forward(
        params, cfg, jnp.asarray(tokens)[None], cache, 0, jnp.arange(4)[None]
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_rcc_delta_conversion(torch_vqgan):
    """Published RCC deltas (submodule-relative keys, utils.py:215-227)
    convert via convert(base+delta) - convert(base) and apply back through
    the generate.py --*_ft_ckpt path to exactly the finetuned weights."""
    from wmar_tpu.utils.checkpoint import apply_delta
    from wmar_tpu.utils.convert import convert_vqgan_delta

    base_sd = {k: v.detach().numpy() for k, v in torch_vqgan.state_dict().items()}
    rng = np.random.default_rng(0)
    delta_sd = {
        k[len("decoder."):]: rng.normal(0, 0.01, v.shape).astype(np.float32)
        for k, v in base_sd.items() if k.startswith("decoder.")
    }
    fn = lambda s: convert.convert_taming_vqgan(s, CFG)  # noqa: E731
    tree = convert_vqgan_delta(base_sd, delta_sd, "decoder", fn)

    # applying the converted delta == converting the finetuned checkpoint
    new_sd = dict(base_sd)
    for k, v in delta_sd.items():
        new_sd["decoder." + k] = base_sd["decoder." + k] + v
    want = fn(new_sd)["params"]["decoder"]
    got = apply_delta(fn(base_sd)["params"]["decoder"], tree)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(got), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(want), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(pa))

    # unknown keys fail fast
    import pytest as _pytest

    with _pytest.raises(KeyError):
        convert_vqgan_delta(base_sd, {"nope.weight": np.zeros(1, np.float32)},
                            "decoder", fn)


def test_merge_chameleon_shards_semantics():
    """TP shard merge: unfused column/row-parallel concat + fused
    wqkv/w13 per-component regrouping (reference loader.py:37-71 +
    transformer.py:95,211 load-hook fusion)."""
    rng = np.random.default_rng(0)
    d, hidden, n = 8, 12, 2
    wq = rng.normal(size=(d, d)).astype(np.float32)
    w1 = rng.normal(size=(hidden, d)).astype(np.float32)
    w3 = rng.normal(size=(hidden, d)).astype(np.float32)
    wo = rng.normal(size=(d, d)).astype(np.float32)
    norm = rng.normal(size=(d,)).astype(np.float32)
    qkv_full = np.concatenate([wq, 2 * wq, 3 * wq], axis=0)

    shards = []
    for r in range(n):
        rows = slice(r * d // n, (r + 1) * d // n)
        hrows = slice(r * hidden // n, (r + 1) * hidden // n)
        shards.append({
            "layers.0.attention.wq.weight": wq[rows],
            "layers.0.feed_forward.w1.weight": w1[hrows],
            "layers.0.feed_forward.w3.weight": w3[hrows],
            "layers.0.attention.wo.weight": wo[:, rows],
            "layers.0.attention_norm.weight": norm,
            # pre-fused sharded layout: each shard stacks its q/k/v slices
            "layers.0.attention.wqkv.weight": np.concatenate(
                [wq[rows], 2 * wq[rows], 3 * wq[rows]], axis=0),
        })
    merged = convert.merge_chameleon_shards(shards)
    np.testing.assert_array_equal(merged["layers.0.attention.wq.weight"], wq)
    np.testing.assert_array_equal(merged["layers.0.feed_forward.w1.weight"], w1)
    np.testing.assert_array_equal(merged["layers.0.attention.wo.weight"], wo)
    np.testing.assert_array_equal(merged["layers.0.attention_norm.weight"], norm)
    np.testing.assert_array_equal(
        merged["layers.0.attention.wqkv.weight"], qkv_full)
