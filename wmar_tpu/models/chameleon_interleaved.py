"""Interleaved text+image generation for Chameleon (the Generator machine).

Counterpart of the reference's ``Generator`` / ``TextDecoder``
(``deps/chameleon/inference/chameleon.py:392-445,216-300``): decode text
until <boi> or EOS, then 1024 image tokens, then <eoi>, then text again.
The reference constructs a fresh decoder (with a re-prefill) at each modal
switch — we do the same: each segment is one jitted scan program over the
accumulated token history, so the host only orchestrates segment boundaries.

Text-segment processors preserved: allowed-tokens mask (text + eos + boi),
repetition penalty, temperature, top-p, optional text watermark, and the
"no <boi> after max_seq_len - 1026" guard (``chameleon.py:270-276``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.core.sampling import warp_and_sample
from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.models.chameleon import ChameleonVocab
from wmar_tpu.models.llama import LlamaConfig, llama_forward


@dataclasses.dataclass(frozen=True)
class TextGenOptions:
    """``Options.Text`` defaults (``chameleon.py:62-68``)."""

    max_gen_len: int = 64
    temp: float = 0.7
    top_p: float = 0.9
    repetition_penalty: float = 1.2
    greedy: bool = False


def make_text_watermark(spec, greenlist):
    """Text-stream watermark hook (the reference's
    ``watermark_logit_processor_text``, ``chameleon.py:398-404``): biases
    green tokens using the last ``h`` emitted tokens as context."""
    from wmar_tpu.core.sampling import apply_watermark_bias, context_keys_at_step

    def hook(logits, buffer, length):
        keys, valid = context_keys_at_step(spec, buffer, length, length)
        return apply_watermark_bias(spec, greenlist, logits, keys, valid)

    return hook


def repetition_penalty_mask(logits: jnp.ndarray, counts: jnp.ndarray, penalty: float) -> jnp.ndarray:
    """HF-style repetition penalty: divide positive logits of seen tokens by
    ``penalty``, multiply negative ones."""
    seen = counts > 0
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, pen, logits)


class ChameleonTextSampler:
    """One text segment: scan with EOS freeze + allowed-token masking."""

    def __init__(
        self,
        params,
        cfg: LlamaConfig,
        vocab: ChameleonVocab,
        opts: TextGenOptions,
        allow_image_start: bool = True,
        max_seq_len: int = 4096,
        cache_dtype=jnp.float32,
        text_watermark=None,
    ):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.opts = opts
        self.max_seq_len = max_seq_len
        self.cache_dtype = cache_dtype
        self.text_watermark = text_watermark
        mask = np.full((vocab.vocab_size,), False)
        mask[vocab.text_tokens] = True
        mask[vocab.eos_id] = True
        if allow_image_start:
            mask[vocab.boi_id] = True
        self.allowed = jnp.asarray(mask)

    def generate(self, prompts: jnp.ndarray, start: jnp.ndarray, rng: jax.Array):
        """``prompts [B, L]`` right-aligned -> ``(tokens [B, max_gen_len],
        n_valid [B])``; after EOS rows emit pad."""
        cfg, opts, vocab = self.cfg, self.opts, self.vocab
        b, l = prompts.shape
        max_len = l + opts.max_gen_len
        cache = KVCache.zeros(cfg.n_layers, b, cfg.n_heads, max_len, cfg.head_dim, self.cache_dtype)
        positions = jnp.maximum(jnp.arange(l)[None, :] - start[:, None], 0)
        logits, cache = llama_forward(self.params, cfg, prompts, cache, 0, positions, start=start)
        logits0 = logits[:, -1]

        counts0 = jax.nn.one_hot(prompts, vocab.vocab_size, dtype=jnp.int32).sum(axis=1)
        # Watermark context buffer = prompt (incl. pads, like the reference's
        # past_ids) followed by emitted tokens.
        buffer0 = jnp.concatenate(
            [prompts.astype(jnp.int32), jnp.zeros((b, opts.max_gen_len), jnp.int32)], axis=1
        )
        # <boi> forbidden once fewer than 1026 slots remain (chameleon.py:270-276)
        boi_budget_ok = l + opts.max_gen_len + 1026 <= self.max_seq_len

        def process(logits, counts, buffer, length):
            logits = logits.astype(jnp.float32)
            if self.text_watermark is not None:
                logits = self.text_watermark(logits, buffer, length)
            logits = jnp.where(self.allowed, logits, -1e10)
            if not boi_budget_ok:
                logits = logits.at[:, vocab.boi_id].set(-1e10)
            return repetition_penalty_mask(logits, counts, opts.repetition_penalty)

        def sample(logits, step_rng):
            return warp_and_sample(
                step_rng, logits, temperature=opts.temp, top_p=opts.top_p, greedy=opts.greedy
            )

        tok0 = sample(process(logits0, counts0, buffer0, jnp.int32(l)), jax.random.fold_in(rng, 0))
        done0 = (tok0 == vocab.eos_id) | (tok0 == vocab.boi_id)
        counts0 = counts0 + jax.nn.one_hot(tok0, vocab.vocab_size, dtype=jnp.int32)
        buffer0 = buffer0.at[:, l].set(tok0)

        def body(carry, step):
            cache, prev, counts, buffer, done = carry
            pos = l + step - 1
            positions = (pos - start)[:, None]
            logits, cache = llama_forward(
                self.params, cfg, prev[:, None], cache, pos, positions, start=start
            )
            tok = sample(
                process(logits[:, -1], counts, buffer, jnp.int32(l) + step),
                jax.random.fold_in(rng, step),
            )
            tok = jnp.where(done, vocab.pad_id, tok)
            counts = counts + jax.nn.one_hot(tok, vocab.vocab_size, dtype=jnp.int32) * (~done)[:, None]
            buffer = jax.lax.dynamic_update_slice(buffer, tok[:, None], (jnp.int32(0), jnp.int32(l) + step))
            done = done | (tok == vocab.eos_id) | (tok == vocab.boi_id)
            return (cache, tok, counts, buffer, done), tok

        if opts.max_gen_len == 1:
            return tok0[:, None], jnp.ones((b,), jnp.int32)
        (_, _, _, _, done), rest = jax.lax.scan(
            body, (cache, tok0, counts0, buffer0, done0),
            jnp.arange(1, opts.max_gen_len, dtype=jnp.int32),
        )
        tokens = jnp.concatenate([tok0[None], rest], axis=0).T  # [B, T]
        n_valid = (tokens != vocab.pad_id).sum(axis=1)
        return tokens, n_valid


def split_token_sequence(tokens: np.ndarray, boi: int, eoi: int) -> List[Tuple[str, np.ndarray]]:
    """Split a 1-row token stream into text/image segments
    (``chameleon_wrapper.py:53-103``)."""
    assert tokens.shape[0] == 1
    segments: List[Tuple[str, np.ndarray]] = []
    current: List[int] = []
    in_image = False
    for token in tokens[0].tolist():
        if token == boi:
            if current:
                segments.append(("text_seg", np.asarray(current)[None]))
                current = []
            in_image = True
        elif token == eoi and in_image:
            segments.append(("image_seg", np.asarray(current)[None]))
            current = []
            in_image = False
        else:
            current.append(token)
    if current:
        segments.append(("image_seg" if in_image else "text_seg", np.asarray(current)[None]))
    return segments


def sample_interleaved(
    wrapper,
    prompt,
    gen_params,
    text_opts: Optional[TextGenOptions] = None,
    max_images: int = 1,
    apply_watermark: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Generate interleaved text/image output for one prompt.

    Host-driven segment loop; each segment is a jitted scan. Returns the
    reference's ``[(kind, tokens)]`` segment list.
    """
    from wmar_tpu.models.chameleon import build_cfg_prompts

    text_opts = text_opts or TextGenOptions()
    vocab = wrapper.vocab
    rng = jax.random.PRNGKey(0) if rng is None else rng
    history = list(wrapper.tokenize_prompts([prompt])[0])
    out_tokens: List[int] = []
    images_done = 0
    pad = vocab.pad_id

    for seg in range(2 * max_images + 1):
        # --- text segment
        prompts = np.asarray(history, dtype=np.int32)[None]
        sampler = ChameleonTextSampler(
            wrapper.llama_params, wrapper.llama_cfg, vocab, text_opts,
            allow_image_start=images_done < max_images, cache_dtype=wrapper.cache_dtype,
        )
        toks, _ = sampler.generate(
            jnp.asarray(prompts), jnp.zeros((1,), jnp.int32), jax.random.fold_in(rng, 2 * seg)
        )
        toks = np.asarray(toks)[0]
        emitted = [int(t) for t in toks if t != pad]
        # truncate at eos / boi
        stop = None
        for i, t in enumerate(emitted):
            if t in (vocab.eos_id, vocab.boi_id):
                stop = i
                break
        text_part = emitted if stop is None else emitted[: stop + 1]
        history += text_part
        out_tokens += text_part
        hit_boi = text_part and text_part[-1] == vocab.boi_id
        hit_eos = text_part and text_part[-1] == vocab.eos_id
        if hit_eos or not hit_boi or images_done >= max_images:
            break

        # --- image segment: re-prefill with CFG rows over the full history
        prompts3, start3, _ = build_cfg_prompts(vocab, [history])
        fn = wrapper._cached_jit(
            ("sample", gen_params, apply_watermark, prompts3.shape),
            lambda: wrapper._build_sample(gen_params, apply_watermark, prompts3.shape),
        )
        img_tokens = np.asarray(
            fn(wrapper.llama_params, jnp.asarray(prompts3), jnp.asarray(start3),
               jax.random.fold_in(rng, 2 * seg + 1))
        )[0]
        history += img_tokens.tolist() + [vocab.eoi_id]
        out_tokens += img_tokens.tolist() + [vocab.eoi_id]
        images_done += 1

    return split_token_sequence(np.asarray(out_tokens)[None], vocab.boi_id, vocab.eoi_id)
