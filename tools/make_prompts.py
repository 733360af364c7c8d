#!/usr/bin/env python
"""Prompt-set preparation CLI (counterpart of the reference's
``wmar_audio/scripts/textprompts.py`` / ``scripts/audioprompts.py``).

  # text prompts via a locally cached instruction LLM
  python tools/make_prompts.py text --num_prompts 1000 --output_dir out/prompts

  # synthesize a chunk of them to wavs (pluggable TTS; --sine for a smoke run)
  python tools/make_prompts.py audio --prompt_file out/prompts/prompts.txt \
      --output_dir out/audio --chunk_idx 0 --total_chunks 8 --sine
"""

from __future__ import annotations

import argparse
import os
import zlib
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from wmar_tpu.audio import prompts as pr


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("text")
    t.add_argument("--num_prompts", type=int, required=True)
    t.add_argument("--output_dir", default="./outputs")
    t.add_argument("--similarity_threshold", type=float, default=0.7)
    t.add_argument("--model_id", default="meta-llama/Llama-3.1-8B-Instruct")
    t.add_argument("--max_gen_len", type=int, default=1024)
    t.add_argument("--temperature", type=float, default=1.0)
    t.add_argument("--seed", type=int, default=42)

    a = sub.add_parser("audio")
    a.add_argument("--prompt_file", required=True)
    a.add_argument("--output_dir", default="outputs/prompts")
    a.add_argument("--chunk_idx", type=int, default=0)
    a.add_argument("--total_chunks", type=int, default=1)
    a.add_argument("--sample_rate", type=int, default=16000)
    a.add_argument("--sine", action="store_true",
                   help="deterministic sine TTS stub (smoke runs; no model needed)")

    args = p.parse_args(argv)

    if args.cmd == "text":
        backend = pr.transformers_prompt_backend(
            args.model_id, args.max_gen_len, args.temperature, args.seed)
        got = pr.generate_text_prompts(backend, args.num_prompts,
                                       args.similarity_threshold)
        os.makedirs(args.output_dir, exist_ok=True)
        path = os.path.join(args.output_dir, "prompts.txt")
        with open(path, "w") as f:
            f.write("\n".join(got) + "\n")
        print(f"wrote {len(got)} prompts to {path}")
        return

    with open(args.prompt_file) as f:
        prompts = [l.strip() for l in f if l.strip()]

    if args.sine:
        def tts(text: str) -> np.ndarray:
            n = args.sample_rate * 2
            f0 = 200.0 + (zlib.crc32(text.encode()) % 400)  # stable per text
            return 0.3 * np.sin(2 * np.pi * f0 / args.sample_rate * np.arange(n))
    else:
        try:  # pragma: no cover - host-dependent
            import torch
            from transformers import AutoProcessor, SeamlessM4Tv2Model

            proc = AutoProcessor.from_pretrained(
                "facebook/seamless-m4t-v2-large", local_files_only=True)
            model = SeamlessM4Tv2Model.from_pretrained(
                "facebook/seamless-m4t-v2-large", local_files_only=True)

            def tts(text: str) -> np.ndarray:
                ins = proc(text=text, src_lang="eng", return_tensors="pt")
                with torch.no_grad():
                    return model.generate(**ins, tgt_lang="eng")[0].numpy()
        except Exception as e:
            raise RuntimeError(
                "audio synthesis needs a locally cached SeamlessM4T-v2 "
                "checkpoint; use --sine for a smoke run") from e

    written = pr.synthesize_audio_prompts(
        prompts, tts, args.output_dir, args.chunk_idx, args.total_chunks,
        args.sample_rate)
    print(f"wrote {len(written)} wavs to {args.output_dir}")


if __name__ == "__main__":
    main()
