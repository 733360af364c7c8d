"""Parity against the ACTUAL reference modules mounted at /root/reference.

Unlike the torch-oracle tests (which re-state the architectures), these
instantiate the reference's own torch modules (watermark_anything, syncseal,
moshi) at tiny configs, export their state dicts through our converters, and
compare forward outputs — the strongest parity evidence available without
the published checkpoints.
"""

import importlib.machinery
import sys
import types

import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"


def _stub_module(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


import numpy as np

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    # APPEND, not insert: /root/reference contains generate.py / wmar / etc.
    # that would otherwise shadow this repo's modules for later tests
    sys.path.append(REF)

# --- light stubs for pip deps the reference imports but never exercises
# on these paths (timm: DropPath/trunc_normal_ used only at init with
# drop_path_rate=0; sentencepiece: tokenizer loading only) ------------------
if "timm" not in sys.modules:
    timm = _stub_module("timm")
    models = _stub_module("timm.models")
    layers = _stub_module("timm.models.layers")

    def trunc_normal_(t, std=0.02):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    class DropPath(torch.nn.Identity):
        def __init__(self, p=0.0):
            super().__init__()

    class Mlp(torch.nn.Module):
        """timm.layers.Mlp (fc1/act/drop1/norm/fc2/drop2 naming)."""

        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=torch.nn.GELU, bias=True, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = torch.nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = torch.nn.Dropout(drop)
            self.fc2 = torch.nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = torch.nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    tlayers = _stub_module("timm.layers")
    tlayers.Mlp = Mlp
    tlayers.trunc_normal_ = trunc_normal_
    tlayers.DropPath = DropPath
    timm.layers = tlayers
    sys.modules["timm.layers"] = tlayers
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
if "sentencepiece" not in sys.modules:
    sp = _stub_module("sentencepiece")
    sp.SentencePieceProcessor = object
    sys.modules["sentencepiece"] = sp
if "bitsandbytes" not in sys.modules:
    _bnb = _stub_module("bitsandbytes")
    sys.modules["bitsandbytes"] = _bnb
if "torchvision" not in sys.modules:
    tv = _stub_module("torchvision")
    tvt = _stub_module("torchvision.transforms")
    tvt.Resize = lambda *a, **k: (lambda x: x)

    def _Normalize(mean, std, *a, **k):
        m = torch.tensor(mean).view(1, -1, 1, 1)
        s = torch.tensor(std).view(1, -1, 1, 1)
        return lambda x: (x - m.to(x)) / s.to(x)

    tvt.Normalize = _Normalize
    tvt.InterpolationMode = types.SimpleNamespace(BILINEAR=0, NEAREST=1)
    tvt.Compose = lambda fns: (lambda x: x)
    tvt.ToTensor = lambda *a, **k: (lambda x: x)
    tvf = _stub_module("torchvision.transforms.functional")
    tvf.resize = lambda x, *a, **k: x
    tvf.perspective = lambda x, *a, **k: x
    tvf.rotate = lambda x, *a, **k: x
    tvf.InterpolationMode = types.SimpleNamespace(BILINEAR=0, NEAREST=1, BICUBIC=2)
    tvf.hflip = lambda x: x
    tvf.crop = lambda x, *a, **k: x
    tvf.pad = lambda x, *a, **k: x
    tvt.functional = tvf
    tvt.v2 = _stub_module("torchvision.transforms.v2")
    tvt.v2.JPEG = object
    tvt.v2.RandomPhotometricDistort = object
    tvt.__path__ = []  # mark as package so .functional imports resolve
    sys.modules["torchvision.transforms.v2"] = tvt.v2
    tv.transforms = tvt
    tvm = _stub_module("torchvision.models")
    tvm.vgg16 = lambda *a, **k: None
    tv.models = tvm
    sys.modules["torchvision.models"] = tvm
    tvu = _stub_module("torchvision.utils")
    tvu.save_image = lambda *a, **k: None
    tv.utils = tvu
    sys.modules["torchvision.utils"] = tvu
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf
# the inner syncseal package uses absolute `syncseal.*` imports
SYNC_ROOT = REF + "/syncseal"
if SYNC_ROOT not in sys.path:
    sys.path.append(SYNC_ROOT)


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# WAM (deps/watermark_anything)
# ---------------------------------------------------------------------------


def test_wam_vit_extractor_vs_reference():
    from deps.watermark_anything.modules.pixel_decoder import PixelDecoder
    from deps.watermark_anything.modules.vit import ImageEncoderViT

    from wmar_tpu.sync import wam_exact as wx

    torch.manual_seed(0)
    enc = ImageEncoderViT(
        img_size=32, patch_size=8, embed_dim=16, out_chans=16, depth=2,
        num_heads=2, window_size=2, global_attn_indexes=(1,), use_rel_pos=True,
    ).eval()
    # non-zero rel-pos so the decomposed term is exercised
    with torch.no_grad():
        for blk in enc.blocks:
            blk.attn.rel_pos_h.normal_(0, 0.02)
            blk.attn.rel_pos_w.normal_(0, 0.02)
    pd = PixelDecoder(embed_dim=16, nbits=4, upscale_stages=[2, 2, 2],
                      upscale_type="bilinear").eval()

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        feats_ref = enc(x)
        preds_ref = pd(feats_ref)

    sd = {}
    sd.update({f"detector.image_encoder.{k}": v for k, v in _np_sd(enc).items()})
    sd.update({f"detector.pixel_decoder.{k}": v for k, v in _np_sd(pd).items()})
    cfg = wx.SAMViTConfig(img_size=32, patch_size=8, embed_dim=16, out_chans=16,
                          depth=2, num_heads=2, window_size=2, global_attn_indexes=(1,))
    params = wx.convert_wam(
        {**sd,
         # satisfy the embedder keys with a tiny VAE below
         **_tiny_wam_embedder_sd()},
        vit_cfg=cfg, upscale_stages=(2, 2, 2),
        enc_cfg=_TINY_ENC, dec_cfg=_TINY_DEC,
    )
    feats = wx.sam_encoder(jax.tree.map(jnp.asarray, params["vit"]), cfg,
                           jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(feats, (0, 3, 1, 2)), feats_ref.numpy(),
                               atol=2e-4)
    # decouple the decoder comparison from ViT float-noise propagation by
    # feeding the reference's own features
    preds = wx.pixel_decoder(
        jax.tree.map(jnp.asarray, params["pixel_decoder"]),
        jnp.asarray(feats_ref.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.transpose(preds, (0, 3, 1, 2)), preds_ref.numpy(),
                               atol=5e-4)


from wmar_tpu.models.vqgan import VQGANConfig  # noqa: E402

_TINY_ENC = VQGANConfig(resolution=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), z_channels=4, n_embed=1, embed_dim=4)
_TINY_DEC = VQGANConfig(resolution=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), z_channels=12, n_embed=1, embed_dim=12)


def _tiny_wam_vae():
    import deps.watermark_anything.modules.vae as ref_vae
    from deps.watermark_anything.modules.msg_processor import MsgProcessor

    # GroupNorm(32) needs divisible channels; reference uses ch>=32 — use a
    # divisor-aware normalizer for the tiny config (same math)
    orig = ref_vae.Normalize
    ref_vae.Normalize = lambda c, num_groups=32: torch.nn.GroupNorm(
        min(num_groups, c), c, eps=1e-6, affine=True
    )
    try:
        torch.manual_seed(1)
        enc = ref_vae.VAEEncoder(ch=8, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                                 attn_resolutions=[], in_channels=3, resolution=32,
                                 z_channels=4, double_z=False)
        dec = ref_vae.VAEDecoder(ch=8, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                                 attn_resolutions=[], in_channels=3, resolution=32,
                                 z_channels=12, tanh_out=True)
    finally:
        ref_vae.Normalize = orig
    msg = MsgProcessor(nbits=4, hidden_size=8)
    return enc, dec, msg


def _tiny_wam_embedder_sd():
    enc, dec, msg = _tiny_wam_vae()
    sd = {}
    sd.update({f"embedder.encoder.{k}": v for k, v in _np_sd(enc).items()})
    sd.update({f"embedder.decoder.{k}": v for k, v in _np_sd(dec).items()})
    sd.update({f"embedder.msg_processor.{k}": v for k, v in _np_sd(msg).items()})
    return sd


def test_wam_vae_embedder_vs_reference():
    """Reference VAEEncoder -> MsgProcessor -> VAEDecoder(tanh) against our
    converted taming modules + msg_concat. GroupNorm(32) in the reference
    needs channel counts >= 32? No — torch GroupNorm(32, 8) fails, so the
    reference normalizer uses num_groups=32 only for real sizes; tiny sizes
    skip via monkeypatched Normalize."""
    enc, dec, msg = _tiny_wam_vae()
    enc.eval(), dec.eval(), msg.eval()
    x = torch.randn(2, 3, 32, 32)
    msgs = torch.randint(0, 2, (2, 4))
    with torch.no_grad():
        lat = enc(x)
        lat_w = msg(lat, msgs)
        delta_ref = dec(lat_w)

    sd = {}
    sd.update({f"embedder.encoder.{k}": v for k, v in _np_sd(enc).items()})
    sd.update({f"embedder.decoder.{k}": v for k, v in _np_sd(dec).items()})
    sd.update({f"embedder.msg_processor.{k}": v for k, v in _np_sd(msg).items()})

    from wmar_tpu.models.vqgan import Decoder, Encoder
    from wmar_tpu.sync import wam_exact as wx
    from wmar_tpu.utils.convert import _convert_taming_decoder, _convert_taming_encoder

    # our Encoder/Decoder use GroupNorm(32): patch for tiny channels
    import flax.linen as nn

    import wmar_tpu.models.vqgan as our_vqgan

    # reference tiny patch uses GroupNorm(min(32, c)); for c<=32 that is
    # one channel per group == flax group_size=1
    orig = our_vqgan._norm
    our_vqgan._norm = lambda groups=32: nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-6)  # noqa: ARG005 — tiny-channel patch ignores the groups arg
    try:
        enc_p = _convert_taming_encoder(sd, _TINY_ENC, "embedder.encoder.")
        dec_p = _convert_taming_decoder(sd, _TINY_DEC, "embedder.decoder.")
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        lat_j = Encoder(_TINY_ENC).apply({"params": jax.tree.map(jnp.asarray, enc_p)}, xj)
        lat_wj = wx.msg_concat(
            jnp.asarray(sd["embedder.msg_processor.msg_embeddings.weight"]),
            lat_j, jnp.asarray(msgs.numpy()),
        )
        delta_j = jnp.tanh(
            Decoder(_TINY_DEC).apply({"params": jax.tree.map(jnp.asarray, dec_p)}, lat_wj)
        )
    finally:
        our_vqgan._norm = orig
    np.testing.assert_allclose(
        np.transpose(delta_j, (0, 3, 1, 2)), delta_ref.numpy(), atol=3e-4
    )


def test_wam_jnd_vs_reference():
    from deps.watermark_anything.modules.jnd import JND

    from wmar_tpu.sync.wam_exact import jnd_heatmaps

    jnd = JND(in_channels=1, out_channels=3, blue=True).eval()
    torch.manual_seed(3)
    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        ref = jnd.heatmaps(x)
    ours = jnd_heatmaps(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), blue=True)
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref.numpy(),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# SyncSeal (syncseal/)
# ---------------------------------------------------------------------------


def test_syncseal_unet_vs_reference():
    from syncseal.modules.unet import UNet

    from wmar_tpu.sync import syncseal_models as sm

    torch.manual_seed(4)
    ref = UNet(in_channels=1, out_channels=1, z_channels=8, num_blocks=2,
               activation="gelu", normalization="group",
               z_channels_mults=(1, 2), last_tanh=True).eval()
    cfg = sm.UNetConfig(in_channels=1, out_channels=1, z_channels=8,
                        num_blocks=2, z_channels_mults=(1, 2), norm_groups=8)
    x = torch.randn(2, 1, 32, 32)
    with torch.no_grad():
        out_ref = ref(x)
    params = jax.tree.map(jnp.asarray, sm.convert_unet(_np_sd(ref), cfg))
    out = sm.unet_forward(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), out_ref.numpy(),
                               atol=3e-4)


def test_syncseal_convnext_vs_reference():
    import importlib.util

    # load head.py directly: head.py lives in modules/; loading it directly avoids any
    # augmentation chain (torchvision.utils etc.)
    spec = importlib.util.spec_from_file_location(
        "ref_head", SYNC_ROOT + "/syncseal/modules/head.py")
    head_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(head_mod)
    Head = head_mod.Head
    from syncseal.modules.convnext import ConvNeXtV2

    from wmar_tpu.sync import syncseal_models as sm

    torch.manual_seed(5)
    # the reference hard-codes 4 downsample stages (convnext.py:84)
    cn = ConvNeXtV2(depths=[1, 1, 1, 1], dims=[8, 8, 16, 16]).eval()
    head = Head(embed_dim=16, out_dim=8).eval()

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.convnext = cn
            self.head = head

    sd = _np_sd(Wrap())
    cfg = sm.ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 8, 16, 16), out_dim=8)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = head(cn(x))
    params = jax.tree.map(jnp.asarray, sm.convert_convnext(sd, cfg))
    out = sm.convnext_forward(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-4)


def test_syncseal_discriminator_vs_reference():
    from syncseal.modules.discriminator import NLayerDiscriminator

    from wmar_tpu.sync import syncseal_models as sm

    torch.manual_seed(6)
    ref = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3).eval()
    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        out_ref = ref(x)
    params = jax.tree.map(jnp.asarray, sm.convert_discriminator(_np_sd(ref)))
    out = sm.discriminator_forward(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), out_ref.numpy(),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Moshi (wmar_audio/moshi)
# ---------------------------------------------------------------------------


def test_moshi_layer_vs_reference():
    """Reference StreamingTransformerLayer (rms_norm, silu gating) at T=1,
    non-streaming, vs our converted block."""
    sys.path.append(REF + "/wmar_audio")
    from moshi.modules.transformer import StreamingTransformerLayer

    from wmar_tpu.audio.lm import MoshiConfig, _temporal_step
    from wmar_tpu.engine.kvcache import KVCache
    from wmar_tpu.utils.convert import convert_moshi_transformer

    torch.manual_seed(7)
    d, heads = 16, 2
    layer = StreamingTransformerLayer(
        d_model=d, num_heads=heads, dim_feedforward=int(4.125 * d),
        causal=True, context=16, gating="silu", norm="rms_norm",
    ).eval()
    x = torch.randn(2, 1, d)
    with torch.no_grad():
        ref = layer(x)

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            t = torch.nn.Module()
            t.layers = torch.nn.ModuleList([layer])
            self.transformer = t

    cfg = MoshiConfig(dim=d, n_layers=1, n_heads=heads, hidden_scale=4.125)
    blocks = convert_moshi_transformer(_np_sd(Wrap()), cfg.temporal_cfg(), "transformer.")
    params = {"blocks": jax.tree.map(jnp.asarray, blocks), "norm": jnp.ones((d,))}
    cache = KVCache.zeros(1, 2, heads, 4, d // heads)
    out, _ = _temporal_step(params, cfg, jnp.asarray(x.numpy()[:, 0]), cache, 0)
    # our step applies the final rms norm; normalize the reference identically
    ref_n = ref / torch.sqrt((ref**2).mean(-1, keepdim=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref_n[:, 0].numpy(), atol=3e-5)


# ---------------------------------------------------------------------------
# ADM UNet (deps/saberi_wmr/DiffPure/guided_diffusion)
# ---------------------------------------------------------------------------


def test_adm_unet_vs_reference():
    """convert_adm_unet against the reference's actual guided_diffusion
    UNetModel (the DiffPure backbone, utils.py:563-591 loads it with
    256x256_diffusion_uncond.pt)."""
    sys.path.append(REF + "/deps/saberi_wmr/DiffPure")
    from guided_diffusion.unet import UNetModel

    from wmar_tpu.augmentations.diffpure import ADMConfig, ADMUNet, convert_adm_unet

    cfg = ADMConfig(
        image_size=16, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(8,), num_head_channels=16, diffusion_steps=50,
    )
    torch.manual_seed(8)
    ref = UNetModel(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(16 // 8,),  # ds units
        channel_mult=(1, 2), num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, use_fp16=False, dropout=0.0,
    ).eval()
    # zero_module-initialized convs make half the model vanish; perturb
    with torch.no_grad():
        for p in ref.parameters():
            if p.abs().max() == 0 and p.ndim > 1:
                p.add_(0.02 * torch.randn_like(p))

    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([3, 40])
    with torch.no_grad():
        out_ref = ref(x, t)

    variables = jax.tree.map(jnp.asarray, convert_adm_unet(_np_sd(ref), cfg))
    out = ADMUNet(cfg).apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), jnp.asarray(t.numpy())
    )
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), out_ref.numpy(),
                               atol=5e-4)


# ---------------------------------------------------------------------------
# Taming minGPT: greedy-decode token parity vs the reference's own
# sample_with_past (the stated north star), and the real VQGAN convs
# ---------------------------------------------------------------------------


def test_taming_greedy_decode_vs_reference_sample_with_past():
    from deps.taming.modules.transformer.mingpt import GPT, sample_with_past

    from wmar_tpu.engine.decode import SamplerConfig, decode_tokens
    from wmar_tpu.models.taming_gpt import GPTConfig, make_step_fn, prefill
    from wmar_tpu.utils.convert import convert_taming_gpt

    torch.manual_seed(9)
    ref = GPT(vocab_size=32, block_size=32, n_layer=2, n_head=2, n_embd=16,
              embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.2 * torch.randn_like(p))

    cond = torch.tensor([[3]])  # the reference asserts cond_len == 1 (class token)
    with torch.no_grad():
        ref_tokens = sample_with_past(cond, ref, steps=10, temperature=1.0,
                                      sample_logits=False).numpy()[0]

    cfg = GPTConfig(vocab_size=32, block_size=32, n_layer=2, n_head=2, n_embd=16)
    sd = {f"transformer.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_taming_gpt(sd, cfg))
    init_logits, cache = prefill(params, cfg, jnp.asarray(cond.numpy().astype(np.int32)),
                                 max_len=16)
    step_fn = make_step_fn(params, cfg, cond_len=1)
    out, _ = decode_tokens(step_fn, cache, init_logits, 10, jax.random.PRNGKey(0),
                           SamplerConfig(greedy=True))
    np.testing.assert_array_equal(np.asarray(out)[0], ref_tokens)


def test_taming_vqgan_convs_vs_reference():
    from deps.taming.modules.diffusionmodules.model import Decoder as RefDecoder
    from deps.taming.modules.diffusionmodules.model import Encoder as RefEncoder

    from wmar_tpu.models.vqgan import Decoder, Encoder, VQGANConfig
    from wmar_tpu.utils.convert import _convert_taming_decoder, _convert_taming_encoder

    torch.manual_seed(10)
    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[16], in_channels=3, resolution=32,
              z_channels=32, dropout=0.0)
    renc = RefEncoder(double_z=False, **kw).eval()
    rdec = RefDecoder(**kw).eval()
    cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(16,), z_channels=32, n_embed=8, embed_dim=32)

    x = torch.randn(1, 3, 32, 32)
    z = torch.randn(1, 32, 16, 16)
    with torch.no_grad():
        enc_ref = renc(x)
        dec_ref = rdec(z)
    sd = {}
    sd.update({f"encoder.{k}": v.detach().numpy() for k, v in renc.state_dict().items()})
    sd.update({f"decoder.{k}": v.detach().numpy() for k, v in rdec.state_dict().items()})
    enc_p = jax.tree.map(jnp.asarray, _convert_taming_encoder(sd, cfg, "encoder."))
    dec_p = jax.tree.map(jnp.asarray, _convert_taming_decoder(sd, cfg, "decoder."))
    enc = Encoder(cfg).apply({"params": enc_p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    dec = Decoder(cfg).apply({"params": dec_p}, jnp.asarray(z.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(enc, (0, 3, 1, 2)), enc_ref.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.transpose(dec, (0, 3, 1, 2)), dec_ref.numpy(), atol=3e-4)


# ---------------------------------------------------------------------------
# RAR: near-greedy decode parity vs the reference's own RAR.generate
# ---------------------------------------------------------------------------


def test_rar_decode_vs_reference_generate():
    """Token trajectories match the reference's RAR.generate with converted
    weights (temperature -> 0 makes multinomial deterministic), incl. the
    cosine-annealed in-batch CFG (rar.py:429-455)."""
    from deps.rar.modeling.rar import RAR as RefRAR

    from wmar_tpu.core.sampling import warp_and_sample
    from wmar_tpu.models.rar import RARConfig, RARSampler
    from wmar_tpu.utils.convert import convert_rar

    torch.manual_seed(11)

    class NS(dict):
        __getattr__ = dict.__getitem__

    conf = NS(model=NS(
        vq_model=NS(codebook_size=32),
        generator=NS(hidden_size=16, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=32,
                     image_seq_len=8, condition_num_classes=4,
                     dropout=0.0, attn_drop=0.0),
    ))
    ref = RefRAR(conf).eval()
    with torch.no_grad():
        for p in ref.parameters():
            if p.ndim > 1 and p.abs().max() == 0:
                p.add_(0.05 * torch.randn_like(p))

    cond = torch.tensor([1, 3])
    with torch.no_grad():
        ref_ids = ref.generate(
            condition=cond, guidance_scale=4.0, randomize_temperature=1e-5,
            guidance_scale_pow=2.75, kv_cache=True,
        ).numpy()

    cfg = RARConfig(embed_dim=16, depth=2, num_heads=2, intermediate_size=32,
                    image_seq_len=8, codebook_size=32, num_classes=4)
    params = jax.tree.map(jnp.asarray, convert_rar(_np_sd(ref), cfg))
    sampler = RARSampler(params, cfg, jnp.asarray(cond.numpy().astype(np.int32)),
                         guidance_scale=4.0, guidance_scale_pow=2.75,
                         cache_dtype=jnp.float32)
    logits, cache = sampler.prefill()
    toks = []
    prev = jnp.zeros((2,), jnp.int32)
    for step in range(cfg.image_seq_len):
        if step > 0:
            logits, cache = sampler.step_fn(cache, prev, jnp.int32(step))
        prev = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        toks.append(np.asarray(prev))
    np.testing.assert_array_equal(np.stack(toks, axis=1), ref_ids)


# ---------------------------------------------------------------------------
# Mimi codec: full encode/decode vs the reference's MimiModel
# ---------------------------------------------------------------------------


def test_mimi_vs_reference_model():
    """convert_mimi + our Mimi reproduce the reference MimiModel's encode
    codes and decoded waveform at a tiny config (SEANet + causal rope
    bottleneck transformer + learned conv resampling + split RVQ)."""
    sys.path.append(REF + "/wmar_audio")
    from moshi.models.compression import MimiModel
    from moshi.modules import SEANetEncoder, SEANetDecoder, transformer as mtr
    from moshi.quantization import SplitResidualVectorQuantizer

    from wmar_tpu.audio.mimi import Mimi, MimiConfig, convert_mimi

    torch.manual_seed(12)
    seanet_kwargs = dict(
        channels=1, dimension=16, causal=True, n_filters=4, n_residual_layers=1,
        activation="ELU", compress=2, dilation_base=2, disable_norm_outer_blocks=0,
        kernel_size=7, residual_kernel_size=3, last_kernel_size=3, norm="none",
        pad_mode="constant", ratios=[4, 2], true_skip=True,
    )
    tr_kwargs = dict(
        d_model=16, num_heads=2, num_layers=1, causal=True, layer_scale=0.01,
        context=25, conv_layout=True, max_period=10000, gating="none",
        norm="layer_norm", positional_embedding="rope", dim_feedforward=32,
        input_dimension=16, output_dimensions=[16],
    )
    q_kwargs = dict(dimension=8, n_q=4, bins=32, input_dimension=16,
                    output_dimension=16)
    enc = SEANetEncoder(**seanet_kwargs)
    dec = SEANetDecoder(**seanet_kwargs)
    ref = MimiModel(
        enc, dec, SplitResidualVectorQuantizer(**q_kwargs),
        channels=1, sample_rate=24000, frame_rate=24000 / (8 * 2),
        encoder_frame_rate=24000 / 8, causal=True, resample_method="conv",
        encoder_transformer=mtr.ProjectedTransformer(**tr_kwargs),
        decoder_transformer=mtr.ProjectedTransformer(**tr_kwargs),
    ).eval()
    # randomize EMA codebooks (init is zeros-ish)
    with torch.no_grad():
        for name, buf in ref.state_dict().items():
            if name.endswith("embedding_sum"):
                buf.normal_(0, 1.0)
            if name.endswith("cluster_usage"):
                buf.fill_(1.0)

    x = torch.randn(2, 1, 64) * 0.3
    with torch.no_grad():
        codes_ref = ref.encode(x)
        audio_ref = ref.decode(codes_ref)

    cfg = MimiConfig(
        dimension=16, n_filters=4, ratios=(4, 2), n_residual_layers=1,
        kernel_size=7, residual_kernel_size=3, last_kernel_size=3,
        n_q=4, n_q_semantic=1, cardinality=32, codebook_dim=8,
        transformer_layers=1, transformer_heads=2, transformer_ff=32,
        transformer_context=25, layer_scale=0.01, downsample=2,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_mimi(sd, cfg))
    model = Mimi(cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    codes = model.apply(variables, xj, method=Mimi.encode)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    audio = model.apply(variables, codes, method=Mimi.decode)
    np.testing.assert_allclose(
        np.asarray(audio).transpose(0, 2, 1), audio_ref.numpy(), atol=5e-4
    )


# ---------------------------------------------------------------------------
# Moshi LM: full greedy generation vs the reference's LMGen.step
# ---------------------------------------------------------------------------


def test_moshi_generation_vs_reference_lmgen():
    """Greedy token trajectories (text + dep_q audio streams, delay-aligned
    emission) match the reference LMGen ring-cache loop with converted
    weights (lm.py:399-647)."""
    sys.path.append(REF + "/wmar_audio")
    from moshi.models.lm import LMGen, LMModel

    from wmar_tpu.audio.lm import MoshiConfig, MoshiGen, WMConfig
    from wmar_tpu.utils.convert import convert_moshi_lm

    torch.manual_seed(13)
    ref = LMModel(
        dim=16, text_card=24, n_q=3, dep_q=2, card=16, num_heads=2, num_layers=1,
        hidden_scale=4.125, causal=True, context=32, gating="silu", norm="rms_norm",
        positional_embedding="rope", depformer_dim=8,
        depformer_dim_feedforward=int(4.125 * 8), depformer_num_heads=2,
        depformer_num_layers=1, depformer_causal=True, depformer_multi_linear=True,
        depformer_context=3, depformer_gating="silu", depformer_pos_emb="none",
        depformer_weights_per_step=True, delays=[0, 0, 1, 1],
    ).eval()
    with torch.no_grad():
        for p_ in ref.parameters():
            if p_.ndim > 1 and p_.abs().max() == 0:
                p_.add_(0.05 * torch.randn_like(p_))

    gen_ref = LMGen(ref, use_sampling=False)
    n_steps = 7
    outs = []
    with torch.no_grad(), gen_ref.streaming(1):
        for _ in range(n_steps):
            out = gen_ref.step(torch.zeros(1, 1, 1, dtype=torch.long))
            if out is not None:
                outs.append(out[:, :, 0])
    ref_frames = torch.stack(outs, dim=2).numpy()  # [1, 1+dep_q, frames]

    cfg = MoshiConfig(
        n_audio_streams=2, audio_vocab=16, text_vocab=24,
        dim=16, n_layers=1, n_heads=2, dep_dim=8, dep_layers=1, dep_heads=2,
        delays=(0, 1, 1), n_q=3, hidden_scale=4.125,
        depformer_multi_linear=True, depformer_weights_per_step=True,
        depformer_pos_emb="none",
    )
    params = jax.tree.map(jnp.asarray, convert_moshi_lm(_np_sd(ref), cfg))
    ours = MoshiGen(params, cfg, WMConfig(method="none", ngram=0, greedy=True))
    n_frames = ref_frames.shape[2]
    text, audio = ours.generate(n_frames, jax.random.PRNGKey(0), batch=1)
    np.testing.assert_array_equal(np.asarray(text), ref_frames[:, 0])
    np.testing.assert_array_equal(np.asarray(audio), ref_frames[:, 1:])


def test_wam_full_embed_detect_vs_reference():
    """WamExact.embed/detect (normalize -> VAE+msg -> blend -> JND;
    normalize -> ViT -> pixel decoder) against the reference's own Wam class
    (models/wam.py:147-244) at tiny config."""
    from deps.watermark_anything.models.wam import Wam
    from deps.watermark_anything.models.embedder import VAEEmbedder
    from deps.watermark_anything.models.extractor import SegmentationExtractor
    from deps.watermark_anything.modules.jnd import JND
    from deps.watermark_anything.modules.pixel_decoder import PixelDecoder
    from deps.watermark_anything.modules.vit import ImageEncoderViT
    from deps.watermark_anything.data.transforms import normalize_img, unnormalize_img

    from wmar_tpu.sync import wam_exact as wx

    torch.manual_seed(14)
    enc, dec, msg = _tiny_wam_vae()
    embedder = VAEEmbedder(enc, dec, msg)
    vit = ImageEncoderViT(img_size=32, patch_size=8, embed_dim=16, out_chans=16,
                          depth=2, num_heads=2, window_size=2,
                          global_attn_indexes=(1,), use_rel_pos=True)
    with torch.no_grad():
        for blk in vit.blocks:
            blk.attn.rel_pos_h.normal_(0, 0.02)
            blk.attn.rel_pos_w.normal_(0, 0.02)
    pd = PixelDecoder(embed_dim=16, nbits=4, upscale_stages=[2, 2, 2],
                      upscale_type="bilinear")
    detector = SegmentationExtractor(image_encoder=vit, pixel_decoder=pd)
    jnd = JND(in_channels=1, out_channels=3, blue=True,
              preprocess=unnormalize_img, postprocess=normalize_img)
    ref = Wam(embedder, detector, augmenter=None, attenuation=jnd,
              scaling_w=2.0, scaling_i=1.0, img_size_extractor=32).eval()

    x01 = torch.rand(2, 3, 32, 32)
    msgs = torch.randint(0, 2, (2, 4))
    with torch.no_grad():
        out = ref.embed(normalize_img(x01), msgs)
        imgs_w01_ref = unnormalize_img(out["imgs_w"]).clamp(0, 1)
        preds_ref = ref.detect(normalize_img(x01))["preds"]

    cfg = wx.SAMViTConfig(img_size=32, patch_size=8, embed_dim=16, out_chans=16,
                          depth=2, num_heads=2, window_size=2, global_attn_indexes=(1,))
    sd = dict(_tiny_wam_embedder_sd())
    sd.update({f"detector.image_encoder.{k}": v for k, v in _np_sd(vit).items()})
    sd.update({f"detector.pixel_decoder.{k}": v for k, v in _np_sd(pd).items()})
    params = wx.convert_wam(sd, vit_cfg=cfg, upscale_stages=(2, 2, 2),
                            enc_cfg=_TINY_ENC, dec_cfg=_TINY_DEC)

    import flax.linen as nn

    import wmar_tpu.models.vqgan as our_vqgan

    orig = our_vqgan._norm
    our_vqgan._norm = lambda groups=32: nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-6)  # noqa: ARG005 — tiny-channel patch ignores the groups arg
    try:
        wam = wx.WamExact(params, vit_cfg=cfg, enc_cfg=_TINY_ENC, dec_cfg=_TINY_DEC)
        x01j = jnp.asarray(x01.numpy().transpose(0, 2, 3, 1))
        imgs_w = wam.embed(x01j, jnp.asarray(msgs.numpy()))
        preds = wam.detect(x01j)
    finally:
        our_vqgan._norm = orig
    np.testing.assert_allclose(
        np.transpose(imgs_w, (0, 3, 1, 2)), imgs_w01_ref.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(preds), preds_ref.numpy(), atol=2e-3)


# ---------------------------------------------------------------------------
# score-SDE native ops: our XLA upfirdn2d / fused_bias_act vs the
# reference's own python-native fallback (the semantics the CUDA kernels
# implement, score_sde/op/upfirdn2d.py:167-204, fused_act.py:94-120)
# ---------------------------------------------------------------------------


def test_upfirdn2d_vs_reference_native():
    sys.path.append(REF + "/deps/saberi_wmr/DiffPure")
    import torch.utils.cpp_extension as _ce

    _orig_load = _ce.load
    _ce.load = lambda *a, **k: None  # the module JIT-builds CUDA ops at import
    try:
        from score_sde.op.upfirdn2d import upfirdn2d_native
    finally:
        _ce.load = _orig_load

    from wmar_tpu.ops.upfirdn import upfirdn2d

    torch.manual_seed(15)
    kernel = torch.randn(4, 4)
    x = torch.randn(2, 3, 12, 12)
    for up, down, pad in [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 2)), (2, 2, (3, 1))]:
        ref = upfirdn2d_native(x, kernel, up, up, down, down,
                               pad[0], pad[1], pad[0], pad[1]).numpy()
        ours = upfirdn2d(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), jnp.asarray(kernel.numpy()),
            up=up, down=down, pad=pad,
        )
        np.testing.assert_allclose(
            np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-4,
            err_msg=f"up={up} down={down} pad={pad}",
        )


def test_fused_bias_act_vs_reference():
    """fused_leaky_relu semantics: (x + bias) lrelu * sqrt(2)."""
    from wmar_tpu.ops.upfirdn import fused_bias_act

    torch.manual_seed(16)
    x = torch.randn(2, 5, 4, 4)
    bias = torch.randn(5)
    ref = (
        torch.nn.functional.leaky_relu(x + bias.view(1, -1, 1, 1), 0.2) * (2**0.5)
    ).numpy()
    ours = fused_bias_act(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), jnp.asarray(bias.numpy()),
        act="lrelu", alpha=0.2, gain=2**0.5,
    )
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Chameleon VQGAN (@512, the standalone torch copy) and MaskGit VQGAN
# ---------------------------------------------------------------------------


def test_chameleon_vqgan_vs_reference():
    """inference/vqgan.py VQModel (the Anole image tokenizer architecture)
    encodes/decodes identically through convert_taming_vqgan."""
    from deps.chameleon.inference.vqgan import VQModel

    from wmar_tpu.models.vqgan import TamingVQGAN, VQGANConfig
    from wmar_tpu.utils.convert import convert_taming_vqgan

    torch.manual_seed(17)
    ddconfig = dict(
        double_z=False, z_channels=32, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16],
        dropout=0.0,
    )
    ref = VQModel(ddconfig, n_embed=16, embed_dim=32).eval()
    cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(16,), z_channels=32, n_embed=16,
                      embed_dim=32)
    x = torch.rand(1, 3, 32, 32) * 2 - 1
    with torch.no_grad():
        q, _, info = ref.encode(x)
        codes_ref = info[2].reshape(1, -1).numpy()
        rec_ref = ref.decode(q).numpy()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_taming_vqgan(sd, cfg))
    model = TamingVQGAN(cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    codes = model.apply(variables, xj, method=TamingVQGAN.encode_codes)
    np.testing.assert_array_equal(np.asarray(codes).reshape(1, -1), codes_ref)
    rec = model.apply(variables, codes, method=TamingVQGAN.decode_codes)
    np.testing.assert_allclose(
        np.transpose(rec, (0, 3, 1, 2)), rec_ref, atol=5e-4
    )


def test_maskgit_vqgan_vs_reference():
    """deps/rar maskgit_vqgan.py (the RAR tokenizer) through
    convert_maskgit_vqgan."""
    from deps.rar.modeling.modules.maskgit_vqgan import Decoder as MGDec
    from deps.rar.modeling.modules.maskgit_vqgan import Encoder as MGEnc
    from deps.rar.modeling.modules.maskgit_vqgan import VectorQuantizer as MGQ

    from wmar_tpu.models.maskgit_vqgan import MaskGitVQConfig, MaskGitVQGAN
    from wmar_tpu.utils.convert import convert_maskgit_vqgan

    class NS(dict):
        __getattr__ = dict.__getitem__

    conf = NS(
        channel_mult=[1, 2], num_resolutions=2, num_res_blocks=1,
        hidden_channels=32, num_channels=3, quantized_embed_dim=16,
        num_embeddings=8, dropout=0.0, resolution=32, z_channels=16,
    )
    torch.manual_seed(18)
    enc, dec, q = MGEnc(conf).eval(), MGDec(conf).eval(), MGQ(8, 16, 0.25).eval()

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder, self.decoder, self.quantize = enc, dec, q

    x = torch.rand(1, 3, 32, 32)
    with torch.no_grad():
        h = enc(x)
        zq, codes_ref_t, _ = q(h)
        codes_ref = codes_ref_t.reshape(1, -1).numpy()
        rec_ref = dec(zq).numpy()

    cfg = MaskGitVQConfig(resolution=32, hidden_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, z_channels=16, embed_dim=16, n_embed=8)
    sd = {k: v.detach().numpy() for k, v in Wrap().state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_maskgit_vqgan(sd, cfg))
    model = MaskGitVQGAN(cfg)
    # our API speaks [-1, 1] (the rar_wrapper.py:109-128 conversion); the
    # raw torch tokenizer operates in [0, 1]
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1)) * 2.0 - 1.0
    codes = model.apply(variables, xj, method=MaskGitVQGAN.encode_codes)
    np.testing.assert_array_equal(np.asarray(codes).reshape(1, -1), codes_ref)
    rec = model.apply(variables, codes, method=MaskGitVQGAN.decode_codes)
    np.testing.assert_allclose(
        (np.transpose(rec, (0, 3, 1, 2)) + 1.0) / 2.0,
        np.clip(rec_ref, 0, 1), atol=5e-4,
    )


# ---------------------------------------------------------------------------
# SyncSeal model-zoo variants (embedder.py:38-67, extractor.py:70-96)
# ---------------------------------------------------------------------------


def test_syncseal_vae_embedder_vs_reference():
    """Reference VAEEmbedder (syncseal/modules/vae.py GroupNorm(16) encoder ->
    decoder) against convert_vae_embedder + vae_embedder_forward."""
    import syncseal.modules.vae as ref_vae

    from wmar_tpu.models.vqgan import VQGANConfig
    from wmar_tpu.sync import syncseal_zoo as zoo

    torch.manual_seed(11)
    # ch=16 so syncseal's GroupNorm(16) divides every width
    enc = ref_vae.VAEEncoder(ch=16, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                             attn_resolutions=[16], in_channels=3, resolution=32,
                             z_channels=4, double_z=True).eval()
    dec = ref_vae.VAEDecoder(ch=16, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                             attn_resolutions=[16], in_channels=3, resolution=32,
                             z_channels=8, tanh_out=True).eval()
    x01 = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        # == VAEEmbedder.forward (embedder.py:52-67): preprocess, enc, dec.
        # Composed directly to avoid importing syncseal.models' __init__
        # (it drags sync_model -> augmentation -> torchvision).
        out_ref = dec(enc(x01 * 2 - 1))

    cfg = zoo.VAEEmbedderConfig(
        encoder=VQGANConfig(resolution=32, ch=16, ch_mult=(1, 2), num_res_blocks=1,
                            attn_resolutions=(16,), z_channels=4, double_z=True,
                            norm_groups=16, n_embed=1, embed_dim=4),
        decoder=VQGANConfig(resolution=32, ch=16, ch_mult=(1, 2), num_res_blocks=1,
                            attn_resolutions=(16,), z_channels=8, tanh_out=True,
                            norm_groups=16, n_embed=1, embed_dim=8),
    )
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in _np_sd(enc).items()})
    sd.update({f"decoder.{k}": v for k, v in _np_sd(dec).items()})
    params = jax.tree.map(jnp.asarray, zoo.convert_vae_embedder(sd, cfg))
    out = zoo.vae_embedder_forward(params, cfg,
                                   jnp.asarray(x01.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), out_ref.numpy(),
                               atol=5e-4)


def test_syncseal_seg_extractor_vs_reference():
    """Reference SegmentationExtractor forward (sam ViTDet -> PixelDecoder,
    NO [-1,1] preprocess — extractor.py:84-96 composes them directly) against
    convert_seg_extractor + seg_extractor_forward. The torch side composes
    the same two modules to avoid importing syncseal.models (whose __init__
    drags in the augmentation/torchvision chain)."""
    from syncseal.modules.pixel_decoder import PixelDecoder
    from syncseal.modules.vit import ImageEncoderViT

    from wmar_tpu.sync import syncseal_zoo as zoo
    from wmar_tpu.sync.wam_exact import SAMViTConfig

    torch.manual_seed(12)
    enc = ImageEncoderViT(
        img_size=32, patch_size=8, embed_dim=16, out_chans=16, depth=2,
        num_heads=2, window_size=2, global_attn_indexes=(1,), use_rel_pos=True,
    ).eval()
    with torch.no_grad():
        for blk in enc.blocks:
            blk.attn.rel_pos_h.normal_(0, 0.02)
            blk.attn.rel_pos_w.normal_(0, 0.02)
    pd = PixelDecoder(embed_dim=16, nbits=4, upscale_stages=[2, 2, 2],
                      upscale_type="bilinear").eval()
    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        out_ref = pd(enc(x))  # == SegmentationExtractor.forward

    sd = {}
    sd.update({f"image_encoder.{k}": v for k, v in _np_sd(enc).items()})
    sd.update({f"pixel_decoder.{k}": v for k, v in _np_sd(pd).items()})
    cfg = zoo.SegExtractorConfig(
        vit=SAMViTConfig(img_size=32, patch_size=8, embed_dim=16, out_chans=16,
                         depth=2, num_heads=2, window_size=2,
                         global_attn_indexes=(1,)),
        upscale_stages=(2, 2, 2), nparams=4,
    )
    params = jax.tree.map(jnp.asarray, zoo.convert_seg_extractor(sd, cfg))
    out = zoo.seg_extractor_forward(params, cfg,
                                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), out_ref.numpy(),
                               atol=2e-3)
