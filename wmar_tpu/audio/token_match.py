"""Standalone decode->encode token-match evaluation CLI.

Counterpart of the reference's ``wmar_audio/evals/token_match.py:1-404``:

* ``--mode mimi``  — encode audio files with the ORIGINAL Mimi, decode with
  the (possibly finetuned) Mimi, re-encode under each validation
  augmentation, and report per-stream token-match rates
  (``token_match.py:258-335``).
* ``--mode moshi`` — generate frames with the Moshi-style LM (optionally
  prompted by Mimi-encoded audio), decode the audio streams, and measure
  how well re-encoding recovers the generated tokens
  (``token_match.py:115-250``).

Results go to ``<output_dir>/token_match_results.csv`` with the reference's
columns (global_index, audio_file, aug, strength, tm_rate, tm_rate_<k>), and
the per-(aug, strength) means are printed like its pandas groupby
(``token_match.py:105-112``).

Run as ``python -m wmar_tpu.audio.token_match --mode mimi ...``.
"""

from __future__ import annotations

import argparse
import csv
import os
import zlib
from typing import Dict, List, Tuple

import numpy as np

SAMPLE_RATE = 24000  # Mimi is a 24 kHz codec (reference loaders.py:27-28)


def compute_tm(tokens1: np.ndarray, tokens2: np.ndarray, per_channel: bool = False):
    """Token-match rate between ``[B, K, T1]`` and ``[B, K, T2]`` token grids.

    Port of the reference's ``compute_tm`` (``token_match.py:52-104``):
    equal lengths compare position-wise; unequal lengths compare the
    truncated prefix per channel, while the flattened (non-per-channel)
    variant scans all cyclic shifts of the longer sequence and keeps the
    best match.
    """
    t1 = np.asarray(tokens1)
    t2 = np.asarray(tokens2)

    def _prefix_rate(a: np.ndarray, b: np.ndarray) -> float:
        if a.shape[-1] == b.shape[-1]:
            return float((a == b).mean())
        if a.shape[-1] < b.shape[-1]:
            a, b = b, a
        # reference single_channel_rate only evaluates shift 0 (:73)
        return float((a[..., : b.shape[-1]] == b).mean())

    if not per_channel:
        f1 = t1.reshape(t1.shape[0], -1)
        f2 = t2.reshape(t2.shape[0], -1)
        if f1.shape[-1] == f2.shape[-1]:
            return float((f1 == f2).mean())
        if f1.shape[-1] < f2.shape[-1]:
            f1, f2 = f2, f1
        short = f2.shape[-1]
        best = 0.0
        for shift in range(f1.shape[-1]):  # all rolls (:92-97)
            rolled = np.roll(f1, shift, axis=-1)[..., :short]
            best = max(best, float((rolled == f2).mean()))
        return best
    return [_prefix_rate(t1[:, k, :], t2[:, k, :]) for k in range(t1.shape[1])]


def get_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--mode", choices=["moshi", "mimi"], required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--seed", type=int, default=42424242)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--duration_sec", type=float, default=None,
                   help="crop audio files to this length (None = full)")
    p.add_argument("--save_audio", type=int, default=1,
                   help="number of augmented waveforms to save (0 = none)")
    p.add_argument("--save_tokens", type=int, default=0,
                   help="number of token npz files to save (0 = none)")
    # moshi mode
    p.add_argument("--steps", type=int, default=200, help="frames to generate")
    p.add_argument("--temperature", type=float, default=1.0)
    # mimi mode / prompts
    p.add_argument("--audio_dir", type=str, default=None,
                   help="directory of audio files (required for mimi mode)")
    p.add_argument("--nsamples", type=int, default=-1,
                   help="number of audio files to process (-1 = all)")
    # model weights (torch checkpoints or this repo's .msgpack pytrees)
    p.add_argument("--moshi_weight", type=str, default=None)
    p.add_argument("--mimi_weight", type=str, default=None,
                   help="Mimi used for decode + re-encode (e.g. RCC-finetuned)")
    p.add_argument("--mimi_weight_ori", type=str, default=None,
                   help="ORIGINAL Mimi for the first encode (defaults to --mimi_weight)")
    p.add_argument("--tiny", action="store_true",
                   help="randomly-initialized tiny models (smoke/CI path)")
    p.add_argument("--eval_aug", type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=True, help="sweep the validation augmentations")
    return p


def _load_mimi(args):
    import jax
    import jax.numpy as jnp

    from wmar_tpu.audio import Mimi, MimiConfig

    if args.tiny:
        cfg = MimiConfig(
            dimension=64, n_filters=8, ratios=(4, 2), n_residual_layers=1,
            n_q=4, n_q_semantic=1, cardinality=64, codebook_dim=16,
            transformer_layers=1, transformer_heads=2, downsample=2,
        )
        mimi = Mimi(cfg)
        params = mimi.init(jax.random.PRNGKey(1), jnp.zeros((1, cfg.hop_length * 4, 1)))
        return mimi, cfg, params, params

    from wmar_tpu.audio.mimi import MIMI_V0_1, convert_mimi
    from wmar_tpu.utils import checkpoint as ckpt
    from wmar_tpu.utils.convert import load_torch_state_dict

    if not args.mimi_weight:
        raise SystemExit("--mimi_weight required without --tiny")
    cfg = MIMI_V0_1
    mimi = Mimi(cfg)

    def load(path):
        if path.endswith(".msgpack"):
            import jax.numpy as jnp

            like = mimi.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length * 2, 1)))
            return ckpt.load_pytree(path, like)
        return jax.tree.map(jnp.asarray, convert_mimi(load_torch_state_dict(path), cfg))

    params = load(args.mimi_weight)
    params_ori = load(args.mimi_weight_ori) if args.mimi_weight_ori else params
    return mimi, cfg, params, params_ori


def _load_batches(args, sample_rate: int):
    from wmar_tpu.audio.dataloader import AudioDataset

    if not args.audio_dir:
        raise SystemExit("--audio_dir is required")
    ds = AudioDataset(args.audio_dir, target_sr=sample_rate,
                      target_duration=args.duration_sec or 4.0, cache_dir=None)
    n = len(ds) if args.nsamples < 0 else min(args.nsamples, len(ds))
    files = ds.audio_files[:n]
    batches = []
    for i in range(0, n, args.batch_size):
        idxs = list(range(i, min(i + args.batch_size, n)))
        pcm = np.stack([ds[j] for j in idxs])  # [b, T, 1]
        batches.append((files[i : i + len(idxs)], pcm))
    return batches


def _augs(args, sample_rate: int):
    from wmar_tpu.audio.augmentations import get_validation_augs

    if not args.eval_aug:
        return [("identity", lambda x, p, r: x, [0])]
    return get_validation_augs(sample_rate=sample_rate)


def _sweep(args, augs, decoded, orig_tokens, encode_fn, files, results, base_idx, sr):
    """Shared aug sweep: attack decoded audio, re-encode, token-match."""
    import jax

    for name, fn, params in augs:
        for param in params:
            rng = jax.random.fold_in(
                jax.random.PRNGKey(args.seed), zlib.crc32(name.encode()) % 2**31)
            attacked = fn(decoded, param, rng)
            new_tokens = np.asarray(encode_fn(attacked))
            rates = compute_tm(orig_tokens, new_tokens, per_channel=True)
            mean_tm = float(np.mean(rates))
            for b, audio_file in enumerate(files):
                gidx = base_idx + b
                row = {
                    "global_index": gidx,
                    "audio_file": audio_file,
                    "aug": name,
                    "strength": str(param),
                    "tm_rate": mean_tm,
                }
                for k, r in enumerate(rates):
                    row[f"tm_rate_{k}"] = r
                results.append(row)
                if gidx < args.save_tokens:
                    np.savez(
                        os.path.join(args.output_dir, f"{name}_{param}_{gidx:03d}.npz"),
                        original=orig_tokens[b], aug_roundtrip=new_tokens[b])
                if gidx < args.save_audio:
                    from scipy.io import wavfile

                    adir = os.path.join(args.output_dir, "audio")
                    os.makedirs(adir, exist_ok=True)
                    wavfile.write(
                        os.path.join(adir, f"{name}_{param}_{gidx:03d}.wav"), sr,
                        np.clip(np.asarray(attacked[b, :, 0], np.float32), -1, 1))


def run_mimi_eval(args) -> List[dict]:
    """encode(ori) -> decode(ft) -> aug -> encode(ft) -> token match
    (``token_match.py:258-335``)."""
    from wmar_tpu.audio import Mimi

    mimi, cfg, params, params_ori = _load_mimi(args)
    sr = SAMPLE_RATE
    batches = _load_batches(args, sr)
    augs = _augs(args, sr)
    results: List[dict] = []
    done = 0
    for files, pcm in batches:
        orig_tokens = np.asarray(mimi.apply(params_ori, pcm, method=Mimi.encode))
        decoded = mimi.apply(params, orig_tokens, method=Mimi.decode)
        encode_fn = lambda audio: mimi.apply(params, audio, method=Mimi.encode)  # noqa: E731
        _sweep(args, augs, decoded, orig_tokens, encode_fn, files, results, done, sr)
        done += len(files)
    return results


def run_moshi_eval(args) -> List[dict]:
    """LM generation -> decode -> aug -> re-encode -> token match
    (``token_match.py:115-250``)."""
    import jax

    from wmar_tpu.audio import Mimi, MoshiConfig, MoshiGen, init_moshi_params

    mimi, mimi_cfg, mimi_params, mimi_params_ori = _load_mimi(args)
    sr = SAMPLE_RATE
    if args.tiny:
        moshi_cfg = MoshiConfig(
            n_audio_streams=4, audio_vocab=64, text_vocab=64,
            dim=64, n_layers=2, n_heads=2, dep_dim=32, dep_layers=1, dep_heads=2,
            delays=(0, 1, 1, 1),
        )
        moshi_params = init_moshi_params(jax.random.PRNGKey(0), moshi_cfg)
    else:
        from wmar_tpu.audio.lm import MOSHI_V01
        from wmar_tpu.utils import checkpoint as ckpt
        from wmar_tpu.utils.convert import convert_moshi_lm, load_torch_state_dict

        if not args.moshi_weight:
            raise SystemExit("moshi mode needs --moshi_weight (or --tiny)")
        moshi_cfg = MOSHI_V01
        if args.moshi_weight.endswith(".msgpack"):
            like = init_moshi_params(jax.random.PRNGKey(0), moshi_cfg)
            moshi_params = ckpt.load_pytree(args.moshi_weight, like)
        else:
            import jax.numpy as jnp

            moshi_params = jax.tree.map(
                jnp.asarray,
                convert_moshi_lm(load_torch_state_dict(args.moshi_weight), moshi_cfg))

    from wmar_tpu.audio import WMConfig

    # method="none" => plain sampling, but temp still honors --temperature
    # (the reference sets lm_gen.temp, token_match.py:126).
    gen = MoshiGen(moshi_params, moshi_cfg,
                   WMConfig(method="none", temp=args.temperature))
    prompt_codes = None
    batch = args.batch_size
    files: List[str] = []
    if args.audio_dir:
        batches = _load_batches(args, sr)
        files, pcm = batches[0]
        batch = pcm.shape[0]
        prompt_codes = mimi.apply(mimi_params_ori, pcm, method=Mimi.encode)
        prompt_codes = prompt_codes[:, : moshi_cfg.n_audio_streams]
    if not files:
        files = [f"<silence:{b}>" for b in range(batch)]

    _, audio_codes = gen.generate(
        args.steps, jax.random.PRNGKey(args.seed), batch=batch,
        prompt_codes=prompt_codes)
    orig_tokens = np.asarray(audio_codes)  # [B, K, T]
    decoded = mimi.apply(mimi_params, audio_codes, method=Mimi.decode)
    encode_fn = lambda audio: mimi.apply(mimi_params, audio, method=Mimi.encode)  # noqa: E731

    augs = _augs(args, sr)
    results: List[dict] = []
    _sweep(args, augs, decoded, orig_tokens, encode_fn, files, results, 0, sr)
    return results


def save_results(results: List[dict], output_dir: str) -> str:
    """CSV + grouped-mean printout (``token_match.py:105-112``)."""
    path = os.path.join(output_dir, "token_match_results.csv")
    keys: List[str] = []
    for row in results:
        for k in row:
            if k not in keys:
                keys.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(results)
    print(f"Saved token_match evaluation results to {path}")
    groups: Dict[Tuple[str, str], List[float]] = {}
    for row in results:
        groups.setdefault((row["aug"], row["strength"]), []).append(row["tm_rate"])
    print(f"{'aug':<20} {'strength':<12} tm_rate")
    for (aug, strength), vals in sorted(groups.items()):
        print(f"{aug:<20} {strength:<12} {np.mean(vals):.4f}")
    return path


def main(argv=None):
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    np.random.seed(args.seed % 2**32)
    if args.mode == "moshi":
        results = run_moshi_eval(args)
    else:
        if not args.audio_dir:
            raise SystemExit("--audio_dir is required for mimi mode")
        results = run_mimi_eval(args)
    if results:
        save_results(results, args.output_dir)
    return results


if __name__ == "__main__":
    main()
