"""Mimi RCC finetuning: make audio tokens survive decode->attack->encode.

Counterpart of ``wmar_audio/training/finetune_mimi.py`` +
``mimi_ft_wrapper.py``: a frozen replica provides the drift targets, the
trainable encoder/decoder are updated so that re-encoding the (augmented)
decoded audio reproduces the original latents:

  z_q   = rvq.decode(codes)                     (frozen)
  audio = decoder_trainable(z_q)
  drift = L1 + multi-res STFT vs decoder_frozen(z_q)
  a_aug = random_augmentation(audio)
  z_rec = encoder_trainable(a_aug)
  idem  = mse(z_rec, z_q) (pre-quant) + mse(post-quant embeddings)

Deltas export in the same additive format as the image finetune
(``training/apply_deltas.py`` counterpart = wmar_tpu.utils.checkpoint).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from wmar_tpu.audio import augmentations as A
from wmar_tpu.audio.mimi import Mimi, MimiConfig


def multi_res_stft_loss(a: jnp.ndarray, b: jnp.ndarray, fft_sizes=(256, 512, 1024)) -> jnp.ndarray:
    """Spectral convergence + log-magnitude L1 over several resolutions
    (the reference's mrstft loss, ``training/losses``)."""
    total = 0.0
    x = a[..., 0]
    y = b[..., 0]
    for n_fft in fft_sizes:
        hop = n_fft // 4
        if x.shape[-1] < n_fft:
            continue
        fx = _stft_mag(x, n_fft, hop)
        fy = _stft_mag(y, n_fft, hop)
        # eps INSIDE the sqrt: d/dx ||x|| is NaN at x = 0, and the very
        # first finetune step compares bit-identical audio (trainable is a
        # copy of the frozen weights), which poisoned the whole run
        sc = jnp.sqrt(((fy - fx) ** 2).sum() + 1e-12) / (jnp.linalg.norm(fy) + 1e-7)
        lm = jnp.abs(jnp.log(fx + 1e-5) - jnp.log(fy + 1e-5)).mean()
        total = total + sc + lm
    return total / len(fft_sizes)


def _stft_mag(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx] * jnp.hanning(n_fft)
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


TRAIN_AUGS = [
    ("identity", lambda x, r: x),
    ("noise", lambda x, r: A.gaussian_noise(x, 0.01, r)),
    ("pink", lambda x, r: A.pink_noise(x, 0.02, r)),
    ("lowpass", lambda x, r: A.lowpass(x, 0.5)),
    ("smooth", lambda x, r: A.smooth(x, 5)),
    ("echo", lambda x, r: A.echo(x, 0.05, 0.3)),
    ("amplitude", lambda x, r: A.amplitude_scale(x, 0.7)),
]
if A.mp3_available():
    # train-time MP3 with a straight-through gradient, like the reference's
    # MP3Compression(passthrough=True) inside the Mimi finetune augmenter
    TRAIN_AUGS.append(("mp3", lambda x, r: A.mp3_compression_st(x, 64)))


@flax.struct.dataclass
class MimiFTState:
    step: jnp.ndarray
    trainable: dict
    opt_state: optax.OptState


@dataclasses.dataclass(frozen=True)
class MimiFTConfig:
    lr: float = 1e-5
    code_loss_weight: float = 2.0
    aug_prob: float = 0.5


class MimiFTWrapper:
    """Frozen-replica targets + trainable encoder/decoder
    (``training/mimi_ft_wrapper.py:11-80``)."""

    def __init__(self, model: Mimi, frozen_variables):
        self.model = model
        self.frozen = frozen_variables["params"]

    def init_trainable(self):
        return {
            "encoder": jax.tree.map(jnp.asarray, self.frozen["encoder"]),
            "enc_transformer": jax.tree.map(jnp.asarray, self.frozen["enc_transformer"]),
            "decoder": jax.tree.map(jnp.asarray, self.frozen["decoder"]),
            "dec_transformer": jax.tree.map(jnp.asarray, self.frozen["dec_transformer"]),
        }

    def _vars(self, **overrides):
        p = dict(self.frozen)
        p.update(overrides)
        return {"params": p}

    def codes_to_latent(self, codes):
        """Frozen RVQ decode: codes [B, K, T] -> latent [B, T, D]."""
        nq_sem = self.model.cfg.n_q_semantic

        def f(m, c):
            z = m.rvq_first.decode(c[:, :nq_sem])
            return z + m.rvq_rest.decode(c[:, nq_sem:])

        return self.model.apply(self._vars(), codes, method=f)

    def decode(self, trainable, z):
        return self.model.apply(
            self._vars(decoder=trainable["decoder"], dec_transformer=trainable["dec_transformer"]),
            z,
            method=Mimi._from_latent,
        )

    def decode_frozen(self, z):
        return self.model.apply(self._vars(), z, method=Mimi._from_latent)

    def encode_latent(self, trainable, audio):
        return self.model.apply(
            self._vars(encoder=trainable["encoder"], enc_transformer=trainable["enc_transformer"]),
            audio,
            method=Mimi._to_latent,
        )

    def encode_codes(self, trainable, audio):
        z = self.encode_latent(trainable, audio)

        def f(m, zz):
            c1 = m.rvq_first.encode(zz)
            return jnp.concatenate([c1, m.rvq_rest.encode(zz)], axis=1)

        return self.model.apply(self._vars(), z, method=f)


def parse_code_target_indices(code_target_type: str):
    """``finetune_mimi.py:113-143``: 'pre_q'/'post_q' -> None, else digit /
    range / comma lists ('0-2,5', '013') -> sorted indices."""
    import re

    if code_target_type in ("pre_q", "post_q"):
        return None
    indices = set()
    for part in code_target_type.split(","):
        part = part.strip()
        m = re.match(r"(\d+)-(\d+)$", part)
        if m:
            start, end = int(m.group(1)), int(m.group(2))
            if start > end:
                raise ValueError(f"Invalid range in code_target_type: {start}-{end}")
            indices.update(range(start, end + 1))
        elif part.isdigit():
            indices.update(int(d) for d in part)
        else:
            raise ValueError(
                f"Invalid format in code_target_type: {part}. Use 'pre_q', "
                "'post_q', digits (e.g. '0', '13'), or ranges ('0-2', '1-3,5').")
    if not indices:
        raise ValueError(f"Could not parse indices from: {code_target_type}")
    return sorted(indices)


def rcc_forward(wrapper: MimiFTWrapper, trainable, audio, aug_fn=None, rng=None):
    """The reference ``MimiFTWrapper.forward`` pipeline
    (``training/mimi_ft_wrapper.py:49-80``), audio in [B, T, 1]:

    replica encoder -> frozen quantizer (all pre/post latents) ->
    {replica decoder = audio target, trainable decoder = prediction} ->
    (augment) -> trainable encoder -> frozen quantizer again.
    """
    model = wrapper.model
    nq_sem = model.cfg.n_q_semantic

    def quantize_all(m, z):
        c1, q1, pre1, post1 = m.rvq_first.encode_decode_all(z)
        c2, q2, pre2, post2 = m.rvq_rest.encode_decode_all(z)
        return (jnp.concatenate([c1, c2], axis=1), q1 + q2,
                jnp.concatenate([pre1, pre2], axis=0),
                jnp.concatenate([post1, post2], axis=0))

    frozen = wrapper._vars()
    embs_pre_q = model.apply(frozen, audio, method=Mimi._to_latent)
    codes, embs_post_q, all_pre_q, all_post_q = model.apply(
        frozen, embs_pre_q, method=quantize_all)
    audio_recon = model.apply(frozen, embs_post_q, method=Mimi._from_latent)
    audio_recon_pred = wrapper.decode(trainable, embs_post_q)
    if aug_fn is not None:
        audio_recon_pred_aug, selected = aug_fn(audio_recon_pred, rng)
    else:
        audio_recon_pred_aug, selected = audio_recon_pred, jnp.zeros((1,), jnp.int32)
    recons_pre_q = wrapper.encode_latent(trainable, audio_recon_pred_aug)
    recons_codes, recons_post_q, recons_all_pre_q, recons_all_post_q = model.apply(
        frozen, recons_pre_q, method=quantize_all)
    return {
        "audio_recon": audio_recon,
        "audio_recon_pred": audio_recon_pred,
        "audio_recon_pred_aug": audio_recon_pred_aug,
        "embs_pre_q": embs_pre_q,
        "embs_post_q": embs_post_q,
        "all_pre_q": all_pre_q,
        "all_post_q": all_post_q,
        "codes": codes,
        "recons_embs_pre_q_pred": recons_pre_q,
        "recons_embs_post_q_pred": recons_post_q,
        "recons_all_pre_q": recons_all_pre_q,
        "recons_all_post_q": recons_all_post_q,
        "recons_codes": recons_codes,
        "selected_aug": selected,
    }


def rcc_losses_and_metrics(out, audio, audio_loss_fn, code_loss_fn,
                           audio_loss_weight, code_loss_weight,
                           audio_target_type="replica", code_target_type="pre_q"):
    """Loss composition + per-codebook idempotence rate
    (``finetune_mimi.py:185-260``)."""
    if audio_target_type == "replica":
        audio_target = jax.lax.stop_gradient(out["audio_recon"])
    elif audio_target_type == "original":
        audio_target = audio
    else:
        raise ValueError(f"Unknown audio target type: {audio_target_type}")
    audio_loss = audio_loss_fn(out["audio_recon_pred"], audio_target)

    idx = parse_code_target_indices(code_target_type)
    if idx is None:
        if code_target_type == "post_q":
            tgt, pred = out["embs_post_q"], out["recons_embs_post_q_pred"]
        else:  # pre_q
            tgt, pred = out["embs_pre_q"], out["recons_embs_pre_q_pred"]
        code_loss = code_loss_fn(pred, jax.lax.stop_gradient(tgt))
    else:
        tgt = jax.lax.stop_gradient(out["all_post_q"][jnp.asarray(idx)])
        pred = out["recons_all_pre_q"][jnp.asarray(idx)]
        code_loss = jnp.stack(
            [code_loss_fn(pred[i], tgt[i]) for i in range(len(idx))]).mean()

    loss = audio_loss_weight * audio_loss + code_loss_weight * code_loss
    idemp = (out["codes"] == out["recons_codes"]).astype(jnp.float32).mean(
        axis=(0, 2))  # [K]
    metrics = {"loss": loss, "audio_loss": audio_loss, "code_loss": code_loss}
    for k in range(idemp.shape[0]):
        metrics[f"idemp_{k}"] = idemp[k]
    return loss, metrics


def make_rcc_train_step(wrapper: MimiFTWrapper, optimizer, audio_loss_fn,
                        code_loss_fn, audio_loss_weight: float,
                        code_loss_weight: float, aug_fn=None,
                        audio_target_type: str = "replica",
                        code_target_type: str = "pre_q"):
    """Reference-parity train step over raw audio batches
    (``finetune_mimi.py:145-262`` train_one_epoch body)."""

    def loss_fn(trainable, audio, rng):
        out = rcc_forward(wrapper, trainable, audio, aug_fn, rng)
        return rcc_losses_and_metrics(
            out, audio, audio_loss_fn, code_loss_fn, audio_loss_weight,
            code_loss_weight, audio_target_type, code_target_type)

    def train_step(state: MimiFTState, audio, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, audio, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return MimiFTState(state.step + 1, trainable, opt_state), metrics

    return train_step


def make_rcc_eval_step(wrapper: MimiFTWrapper, audio_loss_fn, code_loss_fn,
                       aug_fn=None, audio_target_type: str = "replica",
                       code_target_type: str = "pre_q"):
    """Eval pass (``finetune_mimi.py:264-372`` eval_one_epoch body): losses +
    per-codebook idempotence, plus the reconstructions for host-side
    SISNR/SNR/STOI/PESQ metrics and sample wav dumps."""

    def eval_step(trainable, audio, rng):
        out = rcc_forward(wrapper, trainable, audio, aug_fn, rng)
        _, metrics = rcc_losses_and_metrics(
            out, audio, audio_loss_fn, code_loss_fn, 1.0, 1.0,
            audio_target_type, code_target_type)
        del metrics["loss"]
        return metrics, out["audio_recon"], out["audio_recon_pred"]

    return eval_step


def make_train_step(wrapper: MimiFTWrapper, cfg: MimiFTConfig, optimizer):
    n_augs = len(TRAIN_AUGS)

    def loss_fn(trainable, codes, rng):
        z_q = wrapper.codes_to_latent(codes)
        audio = wrapper.decode(trainable, z_q)
        audio_orig = jax.lax.stop_gradient(wrapper.decode_frozen(z_q))
        drift = jnp.abs(audio - audio_orig).mean() + multi_res_stft_loss(audio, audio_orig)

        k_gate, k_pick, k_aug = jax.random.split(rng, 3)
        idx = jax.random.randint(k_pick, (), 0, n_augs)
        a_aug = jax.lax.switch(idx, [lambda x, r, f=f: f(x, r) for _, f in TRAIN_AUGS], audio, k_aug)
        a_aug = jnp.where(jax.random.uniform(k_gate) < cfg.aug_prob, a_aug, audio)

        z_rec = wrapper.encode_latent(trainable, a_aug)
        idem = ((z_rec - jax.lax.stop_gradient(z_q)) ** 2).mean()
        loss = drift + cfg.code_loss_weight * idem
        return loss, {"loss": loss, "drift": drift, "idem": idem}

    def train_step(state: MimiFTState, codes, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.trainable, codes, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return MimiFTState(state.step + 1, trainable, opt_state), metrics

    return train_step


def init_state(wrapper: MimiFTWrapper, optimizer) -> MimiFTState:
    trainable = wrapper.init_trainable()
    return MimiFTState(jnp.zeros((), jnp.int32), trainable, optimizer.init(trainable))


def validation_token_match(wrapper: MimiFTWrapper, trainable, codes, aug_fn=None, rng=None):
    """decode -> (aug) -> encode -> per-stream token match (the reference's
    ``evals/token_match.py`` metric)."""
    z_q = wrapper.codes_to_latent(codes)
    audio = wrapper.decode(trainable, z_q)
    if aug_fn is not None:
        audio = aug_fn(audio, rng)
    new_codes = wrapper.encode_codes(trainable, audio)
    return (new_codes == codes).mean(axis=-1)  # [B, K]
