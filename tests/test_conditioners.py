"""Moshi conditioner plumbing: LUT conditioner, sum fuser, CFG pairing.

Torch oracle re-states the reference's LUTConditioner + BaseConditioner
forward (``wmar_audio/moshi/conditioners/text.py:106-132``,
``base.py:150-222``) with the released state-dict naming, so
``convert_conditioners`` is exercised on the real layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wmar_tpu.audio.conditioners import (
    ConditionFuser,
    ConditionProvider,
    LUTConditionerConfig,
    cfg_pair,
    convert_conditioners,
    hash_trick,
    init_lut_params,
    lut_condition,
    tokenize_lut,
)


def test_hash_trick_matches_reference_formula():
    import hashlib

    word, bins = "jazz", 31
    assert hash_trick(word, bins) == int(
        hashlib.sha256(word.encode()).hexdigest(), 16) % bins


def test_tokenize_noop_semantics():
    cfg = LUTConditionerConfig(n_bins=8, dim=4, output_dim=6)
    toks, mask = tokenize_lut(cfg, ["rock", None, "rock"])
    assert toks.shape == (3, 1) and mask.shape == (3, 1)
    assert int(toks[1, 0]) == cfg.pad_idx and not bool(mask[1, 0])
    assert int(toks[0, 0]) == int(toks[2, 0]) == hash_trick("rock", 8)
    assert bool(mask[0, 0])


def test_possible_values_table_and_unknown_raises():
    cfg = LUTConditionerConfig(4, 4, 6, possible_values=("a", "b"))
    toks, _ = tokenize_lut(cfg, ["b", "a"])
    assert toks[:, 0].tolist() == [1, 0]
    with pytest.raises(ValueError):
        tokenize_lut(cfg, ["c"])


def test_lut_conditioner_torch_oracle():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class LUTConditioner(nn.Module):
        # reference layout: embed / output_proj (no bias) / learnt_padding
        def __init__(self, n_bins, dim, output_dim):
            super().__init__()
            self.embed = nn.Embedding(n_bins + 1, dim)
            self.output_proj = nn.Linear(dim, output_dim, bias=False)
            self.learnt_padding = nn.Parameter(torch.randn(1, 1, output_dim) * 0.2)

        def forward(self, tokens, mask):
            cond = self.output_proj(self.embed(tokens))
            maskf = mask.float()[..., None]
            return cond * maskf + self.learnt_padding * (1 - maskf)

    torch.manual_seed(0)
    cfg = LUTConditionerConfig(n_bins=16, dim=8, output_dim=12)
    oracle = LUTConditioner(16, 8, 12)
    sd = {f"condition_provider.conditioners.description.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    provider_dict = convert_conditioners(sd, {"description": cfg})
    _, params = provider_dict["description"]

    texts = ["warm male voice", None, "whisper"]
    toks, mask = tokenize_lut(cfg, texts)
    got = lut_condition(params, toks, mask)
    with torch.no_grad():
        want = oracle(torch.tensor(np.asarray(toks), dtype=torch.long),
                      torch.tensor(np.asarray(mask)))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_provider_fuser_sum_and_missing_input():
    cfg_a = LUTConditionerConfig(8, 4, 6)
    cfg_b = LUTConditionerConfig(8, 4, 6)
    provider = ConditionProvider({
        "genre": (cfg_a, jax.tree.map(jnp.asarray, init_lut_params(0, cfg_a))),
        "mood": (cfg_b, jax.tree.map(jnp.asarray, init_lut_params(1, cfg_b))),
    })
    fuser = ConditionFuser({"sum": ["genre", "mood"]})
    conds = provider.condition_tensors([
        {"genre": "rock", "mood": "happy"},
        {"genre": None, "mood": None},
    ])
    s = fuser.get_sum(conds)
    assert s.shape == (2, 1, 6)
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(conds["genre"][0] + conds["mood"][0]))
    with pytest.raises(RuntimeError, match="did not receive"):
        provider.condition_tensors([{"genre": "rock"}])


def test_fuser_rejects_prepend_and_cross():
    with pytest.raises(RuntimeError, match="only `sum`"):
        ConditionFuser({"prepend": ["description"]})
    assert not ConditionFuser({"sum": []}).has_conditions


def test_cfg_pair_null_condition():
    pair = cfg_pair([{"genre": "rock"}, {"genre": "pop"}])
    assert pair == [{"genre": "rock"}, {"genre": "pop"},
                    {"genre": None}, {"genre": None}]


def test_condition_sum_steers_generation():
    """The fused sum condition enters every temporal step and changes the
    sampled streams (lm.py:302-318)."""
    from wmar_tpu.audio import MoshiConfig, MoshiGen, init_moshi_params

    cfg = MoshiConfig(
        text_vocab=32, audio_vocab=24, n_audio_streams=2,
        dim=16, n_layers=1, n_heads=2, dep_dim=16, dep_layers=1, dep_heads=2,
        delays=(0, 1),
    )
    params = init_moshi_params(jax.random.PRNGKey(0), cfg)
    gen = MoshiGen(params, cfg)
    rng = jax.random.PRNGKey(1)
    text0, audio0 = gen.generate_with_inputs(6, rng, batch=2)
    cond = 3.0 * jnp.ones((2, 1, cfg.dim), jnp.float32)
    text1, audio1 = gen.generate_with_inputs(6, rng, batch=2, condition_sum=cond)
    assert text0.shape == text1.shape and audio0.shape == audio1.shape
    assert (np.asarray(text0) != np.asarray(text1)).any() or (
        np.asarray(audio0) != np.asarray(audio1)).any()
