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


def sample_interleaved_fused(
    wrapper,
    prompt,
    gen_params,
    text_opts: Optional[TextGenOptions] = None,
    max_images: int = 1,
    apply_watermark: bool = False,
    rng: Optional[jax.Array] = None,
    max_new_tokens: Optional[int] = None,
    cache_budget: Optional[int] = None,
    sp_mesh=None,
):
    """Interleaved generation as ONE jitted scan — no re-prefill at modal
    switches (ROADMAP #7 / VERDICT r1 #8).

    ``cache_budget`` sizes the KV cache beyond the generation budget (e.g.
    the reference's 4096-token context) to exercise real cache geometry.

    ``sp_mesh``: optional mesh with an ``sp`` axis — the prompt prefill then
    runs sequence-parallel with ring attention (:mod:`wmar_tpu.parallel.ring`),
    right-padding the prompt to a multiple of the ring size. Pad slots stay
    key-masked off and are progressively overwritten by decode writes at
    ``lp+step``, so generation is unchanged.

    All three instruct-CFG rows share a single KV cache over one global
    token history; per-row *key masks* reproduce each row's context
    (full | image-tokens-only | [bos]+current-<boi>) instead of the
    reference's fresh decoders per segment
    (``deps/chameleon/inference/chameleon.py:392-445``). Each row carries
    its own compacted rope position counter (the rank of a token within
    that row's valid set), so queries and keys are rotated at exactly the
    positions a re-prefill of the row's subset sequence would assign —
    including the uncond row's reset to [bos, <boi>] at each new segment.

    Modal switching is data-dependent state inside the scan (`mode` flag +
    counters), exactly the "masked processors + state flags" design SURVEY
    §7 prescribes for jit-friendly control flow.
    """
    from wmar_tpu.core.sampling import instruct_cfg_combine

    text_opts = text_opts or TextGenOptions()
    vocab = wrapper.vocab
    cfg = wrapper.llama_cfg
    opts = wrapper.cfg_opts
    image_seq_len = wrapper.image_seq_len
    rng = jax.random.PRNGKey(0) if rng is None else rng
    prompt_ids = np.asarray(wrapper.tokenize_prompts([prompt])[0], np.int32)
    lp = len(prompt_ids)
    budget = max_new_tokens or (
        max_images * (image_seq_len + 2) + (max_images + 1) * text_opts.max_gen_len
    )
    t_max = max(lp + budget + 1, cache_budget or 0)
    wm = wrapper.watermark_runtime() if apply_watermark else None

    img_ok = np.zeros((vocab.vocab_size,), bool)
    img_ok[np.asarray(vocab.image_tokens)] = True
    for t in (vocab.bos_id, vocab.boi_id, vocab.eoi_id):
        img_ok[t] = True
    text_allowed = np.zeros((vocab.vocab_size,), bool)
    text_allowed[np.asarray(vocab.text_tokens)] = True
    text_allowed[vocab.eos_id] = True

    temp_img = gen_params.temperature if gen_params.temperature is not None else opts.temp
    top_p_img = gen_params.top_p if gen_params.top_p is not None else opts.top_p

    def run(llama_params, prompt_tokens, rng):
        img_ok_j = jnp.asarray(img_ok)
        text_ok_j = jnp.asarray(text_allowed)
        image_mask_j = jnp.asarray(vocab.image_token_mask)
        # --- single prefill over the prompt, 3 rows, per-row key masks
        cache = KVCache.zeros(cfg.n_layers, 3, cfg.n_heads, t_max, cfg.head_dim,
                              wrapper.cache_dtype)
        prow0 = jnp.ones((lp,), bool)
        prow1 = img_ok_j[prompt_tokens]
        prow2 = prompt_tokens == vocab.bos_id
        key_mask0 = jnp.zeros((3, t_max), bool)
        key_mask0 = key_mask0.at[0, :lp].set(prow0)
        key_mask0 = key_mask0.at[1, :lp].set(prow1)
        key_mask0 = key_mask0.at[2, :lp].set(prow2)
        toks3 = jnp.tile(prompt_tokens[None], (3, 1))
        # per-row compacted positions: rank within the row's valid subset
        # (what a re-prefill of that row's own sequence would assign)
        positions = jnp.stack([
            jnp.arange(lp, dtype=jnp.int32),
            jnp.cumsum(prow1.astype(jnp.int32)) - 1,
            jnp.cumsum(prow2.astype(jnp.int32)) - 1,
        ]).clip(0)  # invalid slots are key-masked; their rope angle is moot
        if sp_mesh is not None:
            from wmar_tpu.models.llama import llama_prefill_sp

            n_sp = sp_mesh.shape["sp"]
            lp_pad = -(-lp // n_sp) * n_sp
            logits, cache = llama_prefill_sp(
                llama_params, cfg,
                jnp.pad(toks3, ((0, 0), (0, lp_pad - lp))), cache,
                jnp.pad(positions, ((0, 0), (0, lp_pad - lp))), sp_mesh,
                tp_axis="tp", key_mask=key_mask0,
            )
            last = logits[:, lp - 1]
        else:
            logits, cache = llama_forward(
                llama_params, cfg, toks3, cache, 0, positions, key_mask=key_mask0
            )
            last = logits[:, -1]

        def process(last3, mode, counts, img_buf, img_count, images_done, step,
                    text_count):
            # text path (row 0 only)
            lt = last3[0].astype(jnp.float32)
            lt = repetition_penalty_mask(lt, counts, text_opts.repetition_penalty)
            # <boi> only while a full image (+<eoi>) still fits the budget —
            # the reference's DisallowTokensAtOrAfterIndexLogitsProcessor on
            # begin_image at max_seq_len-1026 (chameleon.py:275-279)
            remaining = budget - (step + 2)
            allow_boi = (images_done < max_images) & (
                remaining >= image_seq_len + 1
            )
            tmask = text_ok_j | (img_ok_j * 0)
            tmask = tmask.at[vocab.boi_id].set(allow_boi)
            lt = jnp.where(tmask, lt, jnp.float32(-1e10))
            # image path (CFG combine over the 3 rows)
            full, img_cond, uncond = (last3[i].astype(jnp.float32) for i in range(3))
            li = instruct_cfg_combine(
                full[None], img_cond[None], uncond[None],
                opts.guidance_scale_text, opts.guidance_scale_image,
            )[0]
            if wm is not None:
                li = wm.bias(li[None], img_buf[None], img_count, img_count)[0]
            li = jnp.where(image_mask_j, li, jnp.float32(-1e10))
            k = jax.random.fold_in(rng, step)
            tok_text = warp_and_sample(
                k, lt[None], temperature=text_opts.temp, top_p=text_opts.top_p,
                greedy=text_opts.greedy,
            )[0]
            tok_img = warp_and_sample(
                k, li[None], temperature=temp_img, top_p=top_p_img,
                greedy=gen_params.greedy,
            )[0]
            # per-segment max_gen_len: at the cap, open an image if one is
            # still budgeted, else end the turn (Options.Text.max_gen_len)
            cap = text_count >= text_opts.max_gen_len
            tok_text = jnp.where(
                cap,
                jnp.where(allow_boi, vocab.boi_id, vocab.eos_id),
                tok_text,
            )
            return jnp.where(mode == 0, tok_text, tok_img)

        def body(carry, step):
            (cache, key_mask, prev, mode, img_buf, img_count, images_done,
             counts, done, pos_ctr, text_count) = carry
            wp = lp + step
            toks = jnp.tile(prev[None, None], (3, 1))
            # each row rotates this token at its own compacted position
            pos = pos_ctr[:, None]
            last3, cache = llama_forward(
                llama_params, cfg, toks, cache, wp, pos, key_mask=key_mask
            )
            pos_ctr = pos_ctr + key_mask[:, wp].astype(jnp.int32)
            tok = process(last3[:, -1], mode, counts, img_buf, img_count,
                          images_done, step, text_count)
            # forced <eoi> once the image segment is complete
            img_full = (mode == 1) & (img_count >= image_seq_len)
            tok = jnp.where(img_full, vocab.eoi_id, tok)
            tok = jnp.where(done, vocab.pad_id, tok)

            is_boi = (mode == 0) & (tok == vocab.boi_id)
            is_eos = (mode == 0) & (tok == vocab.eos_id)
            is_eoi = img_full & ~done
            is_img_tok = (mode == 1) & ~img_full & ~done

            # key-mask updates at the *write position of tok* (next step's wp)
            nwp = wp + 1
            valid0 = ~done
            valid1 = (is_img_tok | is_boi | is_eoi) & ~done
            # uncond row resets to [bos, <boi>] at each new image segment
            key_mask = jax.lax.cond(
                is_boi,
                lambda m: m.at[2].set(jnp.arange(t_max) < 0)
                           .at[2, :lp].set(jnp.asarray(prompt_tokens == vocab.bos_id)),
                lambda m: m,
                key_mask,
            )
            valid2 = (is_img_tok | is_boi | is_eoi) & ~done
            key_mask = key_mask.at[0, nwp].set(valid0)
            key_mask = key_mask.at[1, nwp].set(valid1)
            key_mask = key_mask.at[2, nwp].set(valid2)

            img_buf = jnp.where(
                is_img_tok, img_buf.at[img_count].set(tok), img_buf
            )
            counts = jnp.where(mode == 0, counts.at[tok].add(1), counts)
            img_count = jnp.where(is_boi, 0, jnp.where(is_img_tok, img_count + 1, img_count))
            images_done = images_done + jnp.where(is_eoi, 1, 0)
            mode = jnp.where(is_boi, 1, jnp.where(is_eoi, 0, mode))
            # text-segment length: +1 per text token, reset when a segment
            # boundary (<boi> out of text, <eoi> back into text) is crossed
            text_count = jnp.where(
                is_boi | is_eoi, 0,
                text_count + ((mode == 0) & ~done).astype(jnp.int32),
            )
            done = done | is_eos
            # uncond-row reset: its valid set collapses to {bos}, so its next
            # token (the <boi> just written) sits at compacted position 1
            pos_ctr = jnp.where(is_boi, pos_ctr.at[2].set(1), pos_ctr)
            carry = (cache, key_mask, tok, mode, img_buf, img_count,
                     images_done, counts, done, pos_ctr, text_count)
            return carry, tok

        img_buf0 = jnp.zeros((image_seq_len,), jnp.int32)
        # repetition penalty covers the full past INCLUDING the prompt (the
        # reference penalizes every id in input_ids; ChameleonTextSampler
        # does the same via its prompt histogram)
        counts0 = jnp.zeros((vocab.vocab_size,), jnp.int32).at[prompt_tokens].add(1)
        # first sampled token comes from the prefill logits; apply the same
        # transition logic the scan body uses (a <boi> here switches mode)
        tok0 = process(last, jnp.int32(0), counts0, img_buf0, jnp.int32(0),
                       jnp.int32(0), jnp.int32(-1), jnp.int32(0))
        is_boi0 = tok0 == vocab.boi_id
        key_mask1 = key_mask0.at[0, lp].set(True).at[1, lp].set(is_boi0)
        key_mask1 = jax.lax.cond(
            is_boi0,
            lambda m: m.at[2].set(jnp.zeros((t_max,), bool))
                       .at[2, :lp].set(prompt_tokens == vocab.bos_id)
                       .at[2, lp].set(True),
            lambda m: m,
            key_mask1,
        )
        pos_ctr0 = jnp.stack([
            jnp.int32(lp),
            prow1.sum().astype(jnp.int32),
            jnp.where(is_boi0, 1, prow2.sum()).astype(jnp.int32),
        ])
        carry0 = (cache, key_mask1, tok0, jnp.where(is_boi0, 1, 0).astype(jnp.int32),
                  img_buf0, jnp.int32(0), jnp.int32(0), counts0.at[tok0].add(1),
                  tok0 == vocab.eos_id, pos_ctr0,
                  jnp.where(is_boi0, 0, 1).astype(jnp.int32))
        _, toks = jax.lax.scan(body, carry0, jnp.arange(budget - 1, dtype=jnp.int32))
        return jnp.concatenate([tok0[None], toks])

    fn = wrapper._cached_jit(
        ("interleaved_fused", lp, max_images, apply_watermark,
         text_opts.max_gen_len, budget,
         sp_mesh.shape["sp"] if sp_mesh is not None else 0),
        lambda: jax.jit(run),
    )
    out = np.asarray(fn(wrapper.llama_params, jnp.asarray(prompt_ids), rng))
    emitted = [int(t) for t in out if t != vocab.pad_id]
    if vocab.eos_id in emitted:
        emitted = emitted[: emitted.index(vocab.eos_id) + 1]
    return split_token_sequence(np.asarray(emitted)[None], vocab.boi_id, vocab.eoi_id)


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
