"""Moshi conditioner plumbing (LUT conditioners + sum fuser).

Counterpart of ``wmar_audio/moshi/conditioners/{base,text}.py``: Moshi v0.1
ships without conditioners, but the LM supports them (hibiki-style variants
use e.g. a ``description`` LUT condition), and ``LMGen`` adds
``fuser.get_sum(condition_tensors)`` to the temporal-transformer input every
step (``moshi/models/lm.py:302-318,471-487``). Only the exercised pieces are
ported:

- ``hash_trick`` / ``NoopTokenizer`` semantics (``text.py:34-104``): each
  attribute value maps to one token; ``None`` maps to the pad index with a
  zero-length mask.
- ``LUTConditioner`` (``text.py:106-132``) + ``BaseConditioner.forward``
  (``base.py:150-222``): embedding lookup -> linear output projection
  (no bias) -> masked blend with a learnt padding vector.
- ``ConditionProvider.prepare/forward`` (``base.py:366-483``) collapsed into
  :meth:`ConditionProvider.condition_tensors` (tokenization is host-side and
  cheap; there is no GPU sync point to hide in JAX).
- ``ConditionFuser.get_sum`` (``base.py:546-557``); like the reference,
  ``prepend``/``cross`` fusing raises (``base.py:517-518``).
- CFG pairing: the null condition of ``ClassifierFreeGuidanceDropout``
  (``base.py:326-362``) is the pad token, so :func:`cfg_pair` stacks
  (conditioned, null) along the batch — LMGen's "CFG requires 2x more
  conditions" layout (``lm.py:486-487``).

Conversion: ``convert_conditioners`` maps the released layout
``condition_provider.conditioners.{name}.{embed.weight,output_proj.weight,
learnt_padding}``.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hash_trick(word: str, vocab_size: int) -> int:
    """sha256-based word hashing (``conditioners/text.py:34-45``)."""
    h = int(hashlib.sha256(word.encode("utf-8")).hexdigest(), 16)
    return h % vocab_size


@dataclasses.dataclass(frozen=True)
class LUTConditionerConfig:
    n_bins: int
    dim: int
    output_dim: int
    possible_values: Optional[Tuple[str, ...]] = None  # None => hash_trick
    learn_padding: bool = True

    @property
    def pad_idx(self) -> int:
        return self.n_bins


def init_lut_params(seed: int, cfg: LUTConditionerConfig) -> dict:
    rng = np.random.default_rng(seed)
    p = {
        "embed": rng.standard_normal((cfg.n_bins + 1, cfg.dim)).astype(np.float32),
        "output_proj": (rng.standard_normal((cfg.dim, cfg.output_dim)) / np.sqrt(cfg.dim)).astype(np.float32),
    }
    if cfg.learn_padding:
        p["learnt_padding"] = (0.2 * rng.standard_normal((1, 1, cfg.output_dim))).astype(np.float32)
    return p


def tokenize_lut(cfg: LUTConditionerConfig, texts: Sequence[Optional[str]]):
    """NoopTokenizer semantics: one token per attribute value; ``None`` ->
    pad index with an empty mask (``text.py:63-104``)."""
    tokens, lengths = [], []
    for text in texts:
        if text is None:
            tokens.append(cfg.pad_idx)
            lengths.append(0)
        elif cfg.possible_values is None:
            tokens.append(hash_trick(text, cfg.n_bins))
            lengths.append(1)
        else:
            if text not in cfg.possible_values:
                raise ValueError(f"{text!r} is not in possible_values {cfg.possible_values}")
            tokens.append(cfg.possible_values.index(text))
            lengths.append(1)
    return (jnp.asarray(tokens, jnp.int32)[:, None],
            jnp.asarray(lengths, jnp.int32)[:, None] > 0)


def lut_condition(params: dict, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B,1] tokens -> [B,1,output_dim] condition (BaseConditioner.forward:
    embed -> proj -> masked blend with the learnt padding)."""
    cond = params["embed"][tokens] @ params["output_proj"]
    maskf = mask.astype(cond.dtype)[..., None]
    if "learnt_padding" in params:
        return cond * maskf + params["learnt_padding"] * (1 - maskf)
    return cond * maskf


class ConditionProvider:
    """Named conditioners evaluated together (``base.py:366-483``)."""

    def __init__(self, conditioners: Dict[str, Tuple[LUTConditionerConfig, dict]]):
        self.conditioners = conditioners

    def condition_tensors(
        self, attributes: Sequence[Dict[str, Optional[str]]]
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """List of per-sample {attribute: value} dicts -> {name: (cond, mask)}.
        Every configured conditioner must receive its attribute (the
        reference raises on missing inputs, ``base.py:458-460``)."""
        out = {}
        for name, (cfg, params) in self.conditioners.items():
            texts = []
            for sample in attributes:
                if name not in sample:
                    raise RuntimeError(f"conditioner {name!r} did not receive an input")
                texts.append(sample[name])
            tokens, mask = tokenize_lut(cfg, texts)
            out[name] = (lut_condition(params, tokens, mask), mask)
        return out


class ConditionFuser:
    """Sum-fusing of named conditions (``base.py:485-570``); ``prepend`` and
    ``cross`` raise exactly like the reference (``base.py:517-518``)."""

    def __init__(self, fuse2cond: Dict[str, List[str]]):
        for method, conds in fuse2cond.items():
            if method not in ("sum", "prepend", "cross"):
                raise ValueError(f"invalid fuse method {method}")
            if method in ("prepend", "cross") and conds:
                raise RuntimeError("only `sum` conditionings are supported for now.")
        self.fuse2cond = {"sum": [], "prepend": [], "cross": [], **fuse2cond}

    @property
    def has_conditions(self) -> bool:
        return any(self.fuse2cond.values())

    def get_sum(self, conditions) -> Optional[jnp.ndarray]:
        total = None
        for name in self.fuse2cond["sum"]:
            cond, _ = conditions[name]
            assert cond.shape[1] == 1, cond.shape
            total = cond if total is None else total + cond
        return total


def cfg_pair(attributes: Sequence[Dict[str, Optional[str]]]):
    """(conditioned, null) attribute batch for classifier-free guidance: the
    null condition drops every attribute to ``None`` (pad), matching
    ClassifierFreeGuidanceDropout at p=1 (``base.py:326-362``)."""
    null = [{k: None for k in sample} for sample in attributes]
    return list(attributes) + null


def convert_conditioners(
    sd, dims: Dict[str, LUTConditionerConfig],
    prefix: str = "condition_provider.conditioners.",
) -> Dict[str, Tuple[LUTConditionerConfig, dict]]:
    """Released checkpoint layout -> provider dict. ``dims`` supplies the
    tokenizer config per conditioner name (not stored in weights)."""
    out = {}
    for name, cfg in dims.items():
        p = {
            "embed": np.asarray(sd[f"{prefix}{name}.embed.weight"]),
            "output_proj": np.ascontiguousarray(
                np.asarray(sd[f"{prefix}{name}.output_proj.weight"]).T
            ),
        }
        key = f"{prefix}{name}.learnt_padding"
        if key in sd:
            p["learnt_padding"] = np.asarray(sd[key])
        out[name] = (cfg, jax.tree.map(jnp.asarray, p))
    return out
