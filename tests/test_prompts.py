"""Prompt-prep pipeline (wmar_audio/scripts counterpart) tests."""

import os

import numpy as np
import pytest

from wmar_tpu.audio import prompts as pr


def test_parse_candidates_filters():
    raw = """
Here are some example prompts for you:
1. Describe the history of tea cultivation in China.
2. Explain how tides work in simple terms.
- a bullet line that should be dropped
# a header
short
17. Talk about the evolution of jazz music through the decades.
This line will be treated as possibly truncated and dro
"""
    got = pr.parse_candidate_prompts(raw)
    # meta line (contains "prompt"/"example"), bullets, header, short line
    # dropped; numbering stripped; final (possibly truncated) line dropped.
    assert got == [
        "Describe the history of tea cultivation in China.",
        "Explain how tides work in simple terms.",
        "Talk about the evolution of jazz music through the decades.",
    ]


def test_rouge_l_matches_definition():
    a = "the cat sat on the mat".split()
    b = "the cat lay on the mat".split()
    # LCS = "the cat on the mat" (5); P=R=5/6 -> F=5/6
    assert pr.rouge_l_fmeasure(a, b) == pytest.approx(5 / 6)
    assert pr.rouge_l_fmeasure(a, a) == 1.0
    assert pr.rouge_l_fmeasure(a, ["zebra"]) == 0.0


def test_dedup_filters_near_duplicates():
    cands = [
        "Describe the history of tea cultivation in China.",
        "Describe the history of tea cultivation in Japan.",  # near-dup
        "Explain how tides work in simple terms.",
        "Explain how tides work in simple terms.",  # exact dup
    ]
    acc, filtered = pr.dedup_prompts(cands, num_prompts=10, similarity_threshold=0.7)
    assert acc == [cands[0], cands[2]]
    assert filtered == 1  # near-dup counted; exact dup is just skipped


def test_generate_text_prompts_round_loop():
    texts = iter([
        "1. Describe the water cycle for a child.\n"
        "2. Describe the water cycle for a child.\n"
        "3. Explain why the sky appears blue at noon.\n"
        "this final line may be truncated mid-genera",
        "1. Explain the rules of chess to a beginner.\n"
        "2. Talk about the physics of rainbows today.\n"
        "this final line may be truncated mid-genera",
    ])
    got = pr.generate_text_prompts(lambda: next(texts), num_prompts=3)
    assert len(got) == 3
    assert len(set(got)) == 3


def test_chunking_boundaries():
    prompts = [f"p{i}" for i in range(10)]
    sizes = []
    for c in range(3):
        chunk, start = pr.chunk_prompts(prompts, c, 3)
        assert prompts[start] == chunk[0]
        sizes.append(len(chunk))
    assert sizes == [3, 3, 4]  # remainder goes to the last chunk
    with pytest.raises(ValueError):
        pr.chunk_prompts(prompts, 3, 3)


def test_synthesize_audio_prompts(tmp_path):
    prompts = [f"say number {i}" for i in range(5)]

    def tts(text):
        n = 1600
        return 0.25 * np.sin(2 * np.pi * 440 / 16000 * np.arange(n))

    written = pr.synthesize_audio_prompts(prompts, tts, str(tmp_path),
                                          chunk_idx=1, total_chunks=2)
    # chunk 1 of 2 over 5 prompts -> global indices 2..4
    assert [os.path.basename(w) for w in written] == [
        "prompt_00002.wav", "prompt_00003.wav", "prompt_00004.wav"]
    x, sr = pr.read_wav(written[0])
    assert sr == 16000 and x.shape == (1600,)
    np.testing.assert_allclose(x.max(), 0.25, atol=1e-3)
    assert open(str(tmp_path / "prompt_00002.txt")).read() == "say number 2"


def test_make_prompts_cli_sine(tmp_path):
    from tools import make_prompts

    pf = tmp_path / "prompts.txt"
    pf.write_text("alpha one\nbeta two\n")
    out = tmp_path / "audio"
    make_prompts.main(["audio", "--prompt_file", str(pf), "--output_dir",
                       str(out), "--sine"])
    assert sorted(os.listdir(out)) == [
        "prompt_00000.txt", "prompt_00000.wav",
        "prompt_00001.txt", "prompt_00001.wav"]
