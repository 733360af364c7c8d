"""ARMM wrappers: one API over every autoregressive multimodal model.

TPU-native counterpart of the reference's
``AutoregressiveMultimodalModelWrapper`` (``wmar/models/armm_wrapper.py:22-89``):

  sample(conditioning, gen_params, apply_watermark) -> codes [B, S]
  codes_to_images(codes) -> images (NHWC, [-1, 1])
  images_to_codes(images) -> codes
  get_vq() / get_total_vocab_size() / set_watermarker()

Differences by design: images are NHWC (TPU conv layout), all three stages
(sample / decode / re-encode) are jitted device programs, and the watermark
is fused into the sampler rather than a host callback. ``sample`` is
deterministic given (seed, chunk) via `fold_in`, replacing the reference's
global-torch-seed discipline (``generate.py:303-308``).

Implementation note: params are always *arguments* of the jitted functions,
never closure captures — closure-captured weights become HLO constants,
which bloats executables and breaks remote-compile backends.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.core.greenlist import VQInfo, make_greenlist
from wmar_tpu.core.spec import WatermarkSpec
from wmar_tpu.engine.decode import SamplerConfig, WatermarkRuntime, decode_tokens
from wmar_tpu.models import taming_gpt
from wmar_tpu.models.maskgit_vqgan import MaskGitVQConfig, MaskGitVQGAN
from wmar_tpu.models.rar import RARConfig, RARSampler
from wmar_tpu.models.vqgan import TamingVQGAN, VQGANConfig


@dataclasses.dataclass(frozen=True)
class GenParams:
    """Generation hyperparameters (reference ``gen_params`` dict)."""

    temperature: float = 1.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    greedy: bool = False
    guidance_scale: float = 4.0
    guidance_scale_pow: float = 0.0

    def sampler(self) -> SamplerConfig:
        return SamplerConfig(
            temperature=self.temperature, top_k=self.top_k, top_p=self.top_p, greedy=self.greedy
        )


class ARMMWrapper:
    """Base: shape checks + watermark plumbing + jit caching."""

    codes_size: int
    image_size: int

    def __init__(self):
        self.watermark_spec: Optional[WatermarkSpec] = None
        self.greenlist = None
        self._jit_cache: dict = {}

    def set_watermarker(self, spec: Optional[WatermarkSpec], torch_compat: bool = False):
        self.watermark_spec = spec
        self._jit_cache.clear()
        if spec is not None:
            self.greenlist = make_greenlist(spec, self.get_vq(), torch_compat=torch_compat)

    def watermark_runtime(self) -> Optional[WatermarkRuntime]:
        if self.watermark_spec is None:
            return None
        return WatermarkRuntime(self.watermark_spec, self.greenlist)

    def _cached_jit(self, key, builder):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = jax.jit(builder())
        return fn

    def get_vq(self) -> VQInfo:
        raise NotImplementedError

    def get_total_vocab_size(self) -> int:
        raise NotImplementedError

    def is_codes_shaped(self, codes) -> bool:
        return codes.ndim == 2 and codes.shape[1] == self.codes_size**2

    def is_images_shaped(self, images) -> bool:
        return (
            images.ndim == 4
            and images.shape[1] == self.image_size
            and images.shape[2] == self.image_size
            and images.shape[3] == 3
        )


class TamingARMM(ARMMWrapper):
    """Taming cin_transformer + f=16 VQGAN.

    Conditioning is the raw ImageNet class index used directly as the first
    token: taming's ``Labelator`` (``deps/taming/modules/util.py:103-115``)
    feeds the label id into the shared 16384-token embedding (class ids
    alias the first 1000 code ids — a quirk of the published checkpoint).
    The watermark context buffer also receives the raw index, matching the
    reference, whose logit processor sees ``past_ids`` starting with the
    class id (``taming_wrapper.py:62``, ``mingpt.py:349``).
    """

    def __init__(
        self,
        gpt_params,
        gpt_cfg: taming_gpt.GPTConfig,
        vq_params,
        vq_cfg: VQGANConfig,
        alive_ids: Optional[np.ndarray] = None,
        cond_offset: int = 0,
        cache_dtype=jnp.float32,
    ):
        super().__init__()
        self.gpt_params = gpt_params
        self.gpt_cfg = gpt_cfg
        self.vq = TamingVQGAN(vq_cfg)
        self.vq_params = vq_params
        self.vq_cfg = vq_cfg
        self.alive_ids = alive_ids
        self.codes_size = vq_cfg.codes_per_side
        self.image_size = vq_cfg.resolution
        self.cond_offset = cond_offset
        self.cache_dtype = cache_dtype

    def get_vq(self) -> VQInfo:
        emb = np.asarray(self.vq_params["params"]["quantize"]["embedding"])
        return VQInfo(vocab_size=self.vq_cfg.n_embed, alive_ids=self.alive_ids, embedding=emb)

    def get_total_vocab_size(self) -> int:
        return self.vq_cfg.n_embed

    def _build_sample(self, gen: GenParams, apply_watermark: bool):
        steps = self.codes_size**2
        gpt_cfg = self.gpt_cfg
        v = self.vq_cfg.n_embed
        wm = self.watermark_runtime() if apply_watermark else None
        cond_offset = self.cond_offset
        cache_dtype = self.cache_dtype

        def fn(gpt_params, class_ids, rng):
            cond = (class_ids + cond_offset)[:, None]
            init_logits, cache = taming_gpt.prefill(
                gpt_params, gpt_cfg, cond, max_len=steps + cond.shape[1], dtype=cache_dtype
            )
            init_logits = init_logits[:, :v]
            raw_step = taming_gpt.make_step_fn(gpt_params, gpt_cfg, cond_len=1)

            def step_fn(cache, prev, step):
                logits, cache = raw_step(cache, prev, step)
                return logits[:, :v], cache

            tokens, _ = decode_tokens(
                step_fn,
                cache,
                init_logits,
                steps,
                rng,
                gen.sampler(),
                watermark=wm,
                cond_tokens=class_ids[:, None],
            )
            return tokens

        return fn

    def sample(self, conditioning, gen_params: GenParams, apply_watermark=False, rng=None):
        class_ids = jnp.asarray(conditioning, jnp.int32).reshape(-1)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        fn = self._cached_jit(
            ("sample", gen_params, apply_watermark),
            lambda: self._build_sample(gen_params, apply_watermark),
        )
        return fn(self.gpt_params, class_ids, rng)

    def codes_to_images(self, codes):
        fn = self._cached_jit(
            "c2i",
            lambda: lambda vqp, c: jnp.clip(
                self.vq.apply(vqp, c, method=TamingVQGAN.decode_codes), -1.0, 1.0
            ),
        )
        return fn(self.vq_params, codes)

    def images_to_codes(self, images):
        fn = self._cached_jit(
            "i2c", lambda: lambda vqp, im: self.vq.apply(vqp, im, method=TamingVQGAN.encode_codes)
        )
        return fn(self.vq_params, images)


class RarARMM(ARMMWrapper):
    """RAR generator + MaskGit-VQGAN tokenizer (the throughput flagship)."""

    def __init__(
        self,
        rar_params,
        rar_cfg: RARConfig,
        vq_params,
        vq_cfg: MaskGitVQConfig,
        alive_ids: Optional[np.ndarray] = None,
        cache_dtype=jnp.bfloat16,
    ):
        super().__init__()
        self.rar_params = rar_params
        self.rar_cfg = rar_cfg
        self.vq = MaskGitVQGAN(vq_cfg)
        self.vq_params = vq_params
        self.vq_cfg = vq_cfg
        self.alive_ids = alive_ids
        self.codes_size = int(rar_cfg.image_seq_len**0.5)
        assert self.codes_size == vq_cfg.codes_per_side, (
            f"RAR seq {rar_cfg.image_seq_len} vs tokenizer grid {vq_cfg.codes_per_side}^2"
        )
        self.image_size = vq_cfg.resolution
        self.cache_dtype = cache_dtype

    def get_vq(self) -> VQInfo:
        emb = np.asarray(self.vq_params["params"]["embedding"])
        return VQInfo(vocab_size=self.vq_cfg.n_embed, alive_ids=self.alive_ids, embedding=emb)

    def get_total_vocab_size(self) -> int:
        return self.vq_cfg.n_embed

    def _build_sample(self, gen: GenParams, apply_watermark: bool):
        rar_cfg = self.rar_cfg
        cache_dtype = self.cache_dtype
        wm = self.watermark_runtime() if apply_watermark else None

        def fn(rar_params, class_ids, rng):
            sampler = RARSampler(
                rar_params,
                rar_cfg,
                class_ids,
                guidance_scale=gen.guidance_scale,
                guidance_scale_pow=gen.guidance_scale_pow,
                cache_dtype=cache_dtype,
            )
            init_logits, cache = sampler.prefill()
            tokens, _ = decode_tokens(
                sampler.step_fn,
                cache,
                init_logits,
                rar_cfg.image_seq_len,
                rng,
                gen.sampler(),
                watermark=wm,
                cond_tokens=None,  # RAR's processor sees generated ids only
            )
            return tokens

        return fn

    def sample(self, conditioning, gen_params: GenParams, apply_watermark=False, rng=None):
        class_ids = jnp.asarray(conditioning, jnp.int32).reshape(-1)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        fn = self._cached_jit(
            ("sample", gen_params, apply_watermark),
            lambda: self._build_sample(gen_params, apply_watermark),
        )
        return fn(self.rar_params, class_ids, rng)

    def codes_to_images(self, codes):
        fn = self._cached_jit(
            "c2i", lambda: lambda vqp, c: self.vq.apply(vqp, c, method=MaskGitVQGAN.decode_codes)
        )
        return fn(self.vq_params, codes)

    def images_to_codes(self, images):
        fn = self._cached_jit(
            "i2c", lambda: lambda vqp, im: self.vq.apply(vqp, im, method=MaskGitVQGAN.encode_codes)
        )
        return fn(self.vq_params, images)
