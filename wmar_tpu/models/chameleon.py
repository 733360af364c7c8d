"""Chameleon/Anole-7B text-to-image frontend, TPU-native.

Replaces the reference's NCCL worker pool + CUDA-graph decode
(``deps/chameleon/inference/chameleon.py``) with a single SPMD program: the
Llama backbone runs all three instruct-CFG branches as one 3B batch against
a shared KV cache inside the decode engine's `lax.scan`; tensor parallelism
is sharding metadata on the params (``llama_tp_specs``), not worker
processes.

Pipeline parity (``chameleon.py:303-389`` ImageDecoder):
  CFG rows = [full prompt | image-conditioned filter | <bos><boi>]
  each step: logits -> instruct CFG combine -> watermark -> allow-only
  image tokens -> temperature -> top-p -> sample -> replicate to 3 rows;
  1024 tokens, then EOI.

Vocab translation (``vocab.py:77-122``): image BPE tokens are named
``IMGIMG<digits-as-A..J>Z``; ``img2bpe``/``bpe2img`` tables are device
gathers. Watermarking operates on the full BPE vocab like the reference
(``chameleon_wrapper.py:50-51``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.core.greenlist import VQInfo
from wmar_tpu.core.sampling import instruct_cfg_combine
from wmar_tpu.engine.decode import decode_tokens
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.models.armm import ARMMWrapper, GenParams
from wmar_tpu.models.llama import LlamaConfig, llama_forward
from wmar_tpu.models.vqgan import TamingVQGAN, VQGANConfig


class ChameleonVocab:
    """Vocabulary metadata + bpe<->image-code translation tables."""

    def __init__(self, name2val: dict):
        self.name2val = dict(name2val)
        self.vocab_size = max(self.name2val.values()) + 1
        self.bos_id = self.name2val.get("<s>")
        self.eos_id = self.name2val.get("</s>")
        self.boi_id = self.name2val.get("<racm3:break>")
        self.eoi_id = self.name2val.get("<eoss>")
        self.pad_id = self.name2val.get("<pad>")
        self.eot_id = self.name2val.get("<reserved08706>")

        chr_map = {chr(ord("A") + i): str(i) for i in range(10)}
        bpe2img = {}
        for name, val in self.name2val.items():
            if name.startswith("IMGIMG"):
                digits = "".join(chr_map.get(c, "") for c in name[len("IMGIMG"):-1])
                bpe2img[val] = int(digits)
        self.image_tokens = sorted(bpe2img)
        self._bpe2img_np = np.full((self.vocab_size,), -1, dtype=np.int32)
        img_max = max(bpe2img.values()) if bpe2img else 0
        self._img2bpe_np = np.zeros((img_max + 1,), dtype=np.int32)
        for bpe, img in bpe2img.items():
            self._bpe2img_np[bpe] = img
            self._img2bpe_np[img] = bpe
        self.bpe2img_table = jnp.asarray(self._bpe2img_np)
        self.img2bpe_table = jnp.asarray(self._img2bpe_np)
        special = {v for n, v in self.name2val.items() if n.startswith("<") and n != "<"}
        self.special_tokens = sorted(special)
        self.text_tokens = sorted(
            set(self.name2val.values()) - set(self.image_tokens) - special
        )
        mask = np.zeros((self.vocab_size,), dtype=bool)
        mask[self.image_tokens] = True
        self.image_token_mask = jnp.asarray(mask)

    @staticmethod
    def from_tokenizer_json(path: str) -> "ChameleonVocab":
        import json

        with open(path) as f:
            tok = json.load(f)
        name2val = dict(tok["model"]["vocab"])
        for item in tok.get("added_tokens", []):
            name2val[item["content"]] = item["id"]
        return ChameleonVocab(name2val)

    @staticmethod
    def synthetic(n_codes: int = 32, n_text: int = 40) -> "ChameleonVocab":
        """Tiny vocab for tests: specials + text + IMGIMG code tokens."""
        name2val = {"<s>": 0, "</s>": 1, "<racm3:break>": 2, "<eoss>": 3, "<pad>": 4,
                    "<reserved08706>": 5}
        nxt = 6
        for i in range(n_text):
            name2val[f"tok{i}"] = nxt
            nxt += 1
        for code in range(n_codes):
            name = "IMGIMG" + "".join(chr(ord("A") + int(d)) for d in str(code)) + "Z"
            name2val[name] = nxt
            nxt += 1
        return ChameleonVocab(name2val)

    def bpe_to_img(self, codes: jnp.ndarray) -> jnp.ndarray:
        return self.bpe2img_table[codes]

    def img_to_bpe(self, codes: jnp.ndarray) -> jnp.ndarray:
        return self.img2bpe_table[codes]


@dataclasses.dataclass
class ImageCFGOptions:
    """``Options.Image`` defaults (``chameleon.py:58-91``)."""

    guidance_scale_text: float = 3.0
    guidance_scale_image: float = 1.2
    temp: float = 0.7
    top_p: float = 0.9


def build_cfg_prompts(
    vocab: ChameleonVocab, prompt_ids: List[List[int]]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the right-aligned 3B prompt matrix for instruct CFG.

    Rows: full-conditioned | image-conditioned (image/bos/boi/eoi ids only)
    | unconditioned [bos, boi]; every row ends with <boi>
    (``chameleon.py:337-381``). Returns (tokens [3B, L], start [3B],
    lengths [3B]) with left padding.
    """
    img_ok = set(vocab.image_tokens) | {vocab.bos_id, vocab.boi_id, vocab.eoi_id}
    full = [list(p) + ([] if p and p[-1] == vocab.boi_id else [vocab.boi_id]) for p in prompt_ids]
    image_cond = [[t for t in p if t in img_ok] for p in prompt_ids]
    image_cond = [p + ([] if p and p[-1] == vocab.boi_id else [vocab.boi_id]) for p in image_cond]
    uncond = [[vocab.bos_id, vocab.boi_id] for _ in prompt_ids]
    rows = full + image_cond + uncond
    max_len = max(len(r) for r in rows)
    out = np.full((len(rows), max_len), vocab.pad_id, dtype=np.int32)
    start = np.zeros((len(rows),), dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, max_len - len(r):] = r
        start[i] = max_len - len(r)
    return out, start, np.asarray([len(r) for r in rows], dtype=np.int32)


class ChameleonT2ISampler:
    """Prefill + engine step_fn for 1024-token image generation."""

    def __init__(
        self,
        params,
        cfg: LlamaConfig,
        vocab: ChameleonVocab,
        prompts: jnp.ndarray,
        start: jnp.ndarray,
        cfg_opts: ImageCFGOptions,
        image_seq_len: int = 1024,
        cache_dtype=jnp.bfloat16,
        sp_mesh=None,
        pp_mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.prompts = prompts  # [3B, L]
        self.start = start  # [3B]
        self.opts = cfg_opts
        self.image_seq_len = image_seq_len
        self.cache_dtype = cache_dtype
        self.sp_mesh = sp_mesh  # ring-attention sequence-parallel prefill
        self.pp_mesh = pp_mesh  # GPipe pipeline-parallel prefill
        self.prompt_len = prompts.shape[1]
        self.b = prompts.shape[0] // 3

    def _combine_and_mask(self, logits: jnp.ndarray) -> jnp.ndarray:
        full, img_cond, uncond = jnp.split(logits, 3, axis=0)
        mixed = instruct_cfg_combine(
            full, img_cond, uncond, self.opts.guidance_scale_text, self.opts.guidance_scale_image
        )
        return mixed

    def allow_only_mask(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(self.vocab.image_token_mask, logits, jnp.float32(-1e10))

    def prefill(self):
        max_len = self.prompt_len + self.image_seq_len
        cache = KVCache.zeros(
            self.cfg.n_layers, self.prompts.shape[0], self.cfg.n_heads, max_len,
            self.cfg.head_dim, self.cache_dtype,
        )
        positions = jnp.maximum(jnp.arange(self.prompt_len)[None, :] - self.start[:, None], 0)
        if self.pp_mesh is not None:
            # pipeline-parallel prefill: layers over the pp stage ring
            from wmar_tpu.parallel.pipeline import llama_prefill_pp

            logits, cache = llama_prefill_pp(
                self.params, self.cfg, self.prompts, cache, positions,
                self.pp_mesh, start=self.start,
            )
        elif self.sp_mesh is not None:
            # sequence-parallel ring prefill; the caller left-pads prompts to
            # a multiple of the ring size (start absorbs the shift)
            from wmar_tpu.models.llama import llama_prefill_sp

            logits, cache = llama_prefill_sp(
                self.params, self.cfg, self.prompts, cache, positions,
                self.sp_mesh, tp_axis="tp", start=self.start,
            )
        else:
            logits, cache = llama_forward(
                self.params, self.cfg, self.prompts, cache, 0, positions, start=self.start
            )
        return self._combine_and_mask(logits[:, -1]), cache

    def step_fn(self, cache: KVCache, prev: jnp.ndarray, step):
        tokens = jnp.tile(prev, (3,))[:, None]  # replicate sampled token to CFG rows
        write_pos = jnp.int32(self.prompt_len) + step - 1
        positions = (write_pos - self.start)[:, None]
        logits, cache = llama_forward(
            self.params, self.cfg, tokens, cache, write_pos, positions, start=self.start
        )
        return self._combine_and_mask(logits[:, -1]), cache


class ChameleonARMM(ARMMWrapper):
    """Anole-7B wrapper: text prompts -> watermarked image codes (BPE space).

    Codes are full-BPE-vocab token ids like the reference
    (``get_total_vocab_size`` = 65536, ``chameleon_wrapper.py:50-51``);
    translation to VQGAN codebook ids happens inside
    codes_to_images/images_to_codes.
    """

    def __init__(
        self,
        llama_params,
        llama_cfg: LlamaConfig,
        vocab: ChameleonVocab,
        vq_params,
        vq_cfg: VQGANConfig,
        tokenizer=None,
        alive_ids: Optional[np.ndarray] = None,
        image_seq_len: int = 1024,
        cfg_opts: Optional[ImageCFGOptions] = None,
        cache_dtype=jnp.bfloat16,
        sp_mesh=None,
        pp_mesh=None,
    ):
        super().__init__()
        self.llama_params = llama_params
        self.llama_cfg = llama_cfg
        self.vocab = vocab
        self.vq = TamingVQGAN(vq_cfg)
        self.vq_params = vq_params
        self.vq_cfg = vq_cfg
        self.tokenizer = tokenizer
        self.alive_ids = alive_ids
        self.image_seq_len = image_seq_len
        self.codes_size = int(image_seq_len**0.5)
        assert self.codes_size == vq_cfg.codes_per_side
        self.image_size = vq_cfg.resolution
        self.cfg_opts = cfg_opts or ImageCFGOptions()
        self.cache_dtype = cache_dtype
        # Optional mesh with an "sp" axis: prompt prefill runs ring-attention
        # sequence-parallel (parallel/ring.py); prompts are left-padded to the
        # ring size in sample() and the per-row start offsets absorb the shift.
        self.sp_mesh = sp_mesh
        # Optional mesh with a "pp" axis: prompt prefill streams the CFG rows
        # through the GPipe stage ring (parallel/pipeline.py).
        self.pp_mesh = pp_mesh

    def get_vq(self) -> VQInfo:
        # Alive ids live in BPE space for Chameleon (assets/chameleon_all_ids.txt).
        emb = np.asarray(self.vq_params["params"]["quantize"]["embedding"])
        return VQInfo(vocab_size=self.vocab.vocab_size, alive_ids=self.alive_ids, embedding=emb)

    def get_total_vocab_size(self) -> int:
        return self.vocab.vocab_size

    def tokenize_prompts(self, prompts: Sequence) -> List[List[int]]:
        """(idx, text) tuples or raw strings -> BPE id lists with
        [bos] ... [eot] framing (the reference's END-OF-TURN sentinel)."""
        out = []
        for p in prompts:
            text = p[1] if isinstance(p, (tuple, list)) else p
            if self.tokenizer is None:
                raise ValueError("No text tokenizer configured")
            ids = self.tokenizer(text)
            out.append([self.vocab.bos_id] + list(ids) + [self.vocab.eot_id])
        return out

    def _build_sample(self, gen: GenParams, apply_watermark: bool, prompt_shape):
        from wmar_tpu.engine.decode import SamplerConfig

        wm = self.watermark_runtime() if apply_watermark else None
        sampler_cfg = SamplerConfig(
            temperature=gen.temperature if gen.temperature is not None else self.cfg_opts.temp,
            top_k=gen.top_k,
            top_p=gen.top_p if gen.top_p is not None else self.cfg_opts.top_p,
            greedy=gen.greedy,
        )

        def fn(llama_params, prompts, start, rng):
            sampler = ChameleonT2ISampler(
                llama_params, self.llama_cfg, self.vocab, prompts, start,
                self.cfg_opts, self.image_seq_len, self.cache_dtype,
                sp_mesh=self.sp_mesh, pp_mesh=self.pp_mesh,
            )
            init_logits, cache = sampler.prefill()
            init_logits = sampler.allow_only_mask(init_logits)

            def step_fn(cache, prev, step):
                logits, cache = sampler.step_fn(cache, prev, step)
                return logits, cache

            # Watermark order parity: CFG -> watermark -> allow-only. The
            # engine applies the watermark before warps, so fold allow-only
            # into the step output *after* the watermark via a wrapper: the
            # engine's watermark hook biases first, then allow-only happens
            # inside the logits (we pre-mask: adding delta to a -inf logit
            # keeps it -inf, so bias-then-mask == mask-then-bias here).
            def masked_step(cache, prev, step):
                logits, cache = step_fn(cache, prev, step)
                return sampler.allow_only_mask(logits), cache

            tokens, _ = decode_tokens(
                masked_step,
                cache,
                init_logits,
                self.image_seq_len,
                rng,
                sampler_cfg,
                watermark=wm,
                cond_tokens=prompts[: prompts.shape[0] // 3],  # full-cond rows
            )
            return tokens

        return fn

    def sample(self, conditioning, gen_params: GenParams, apply_watermark=False, rng=None):
        prompt_ids = self.tokenize_prompts(conditioning)
        prompts, start, _ = build_cfg_prompts(self.vocab, prompt_ids)
        if self.sp_mesh is not None:
            n_sp = self.sp_mesh.shape["sp"]
            d = (-prompts.shape[1]) % n_sp
            if d:
                prompts = np.pad(prompts, ((0, 0), (d, 0)),
                                 constant_values=self.vocab.pad_id)
                start = np.asarray(start) + d
        rng = jax.random.PRNGKey(0) if rng is None else rng
        fn = self._cached_jit(
            ("sample", gen_params, apply_watermark, prompts.shape,
             self.sp_mesh.shape["sp"] if self.sp_mesh is not None else 0,
             self.pp_mesh.shape["pp"] if self.pp_mesh is not None else 0),
            lambda: self._build_sample(gen_params, apply_watermark, prompts.shape),
        )
        return fn(self.llama_params, jnp.asarray(prompts), jnp.asarray(start), rng)

    def codes_to_images(self, codes):
        fn = self._cached_jit(
            "c2i",
            lambda: lambda vqp, c: jnp.clip(
                self.vq.apply(
                    vqp, jnp.maximum(self.vocab.bpe2img_table[c], 0), method=TamingVQGAN.decode_codes
                ),
                -1.0,
                1.0,
            ),
        )
        return fn(self.vq_params, codes)

    def images_to_codes(self, images):
        fn = self._cached_jit(
            "i2c",
            lambda: lambda vqp, im: self.vocab.img2bpe_table[
                self.vq.apply(vqp, im, method=TamingVQGAN.encode_codes)
            ],
        )
        return fn(self.vq_params, images)
