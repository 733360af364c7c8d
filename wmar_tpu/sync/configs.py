"""Loaders for the reference's SyncSeal yaml configs.

The reference's ``train_sync.py`` consumes four yaml files
(``syncseal/configs/{embedder,extractor,attenuation,all_augs}.yaml``);
these loaders parse the same grammar and map each onto the wmar_tpu
equivalents:

* embedder.yaml  -> ``syncseal_models.UNetConfig`` (train_sync.py:69)
* extractor.yaml -> ``syncseal_models.ConvNeXtConfig`` (train_sync.py:71)
* attenuation.yaml -> JND variant name check (train_sync.py:73; the shipped
  model uses ``jnd_1_1``, the only variant wired into ``embed01``)
* all_augs.yaml  -> per-family sampling weights for the in-training
  valuemetric bank and the geometric corner sampler (train_sync.py:81)

A divergence worth knowing: the reference composes augs per image
(identity/crop first, then optionally more); the wmar_tpu trainer samples
exactly one valuemetric + one geometric aug per image inside one jitted
``lax.switch``. The yaml weights steer both samplers the same way.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


def _load_yaml(path: str) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def load_embedder_config(path: str):
    """embedder.yaml -> the matching registry config. Selects the entry named
    by the top-level ``model:`` key (suffix-matched like the reference's
    builder, so ``model: unet_small2_yuv_quant`` resolves
    ``unet_small2_yuv_quantizable``). Registry dispatch mirrors
    ``embedder.py:99-110``: ``vae*`` -> :class:`VAEEmbedderConfig`,
    ``unet*`` -> :class:`UNetConfig`."""
    from wmar_tpu.sync.syncseal_models import UNetConfig

    d = _load_yaml(path)
    name = d.get("model", "unet_small2_yuv")
    entry = d.get(name)
    if entry is None:
        matches = [k for k in d if k != "model" and isinstance(d[k], dict)
                   and (k.startswith(name) or name.startswith(k))]
        if not matches:
            raise ValueError(f"{path}: no model entry matching {name!r}")
        entry = d[matches[0]]
        name = matches[0]
    if name.startswith("vae") or ("encoder" in entry and "decoder" in entry):
        from wmar_tpu.sync.syncseal_zoo import vae_embedder_config

        return vae_embedder_config(entry, name)
    if not name.startswith("unet") and not (
        {"z_channels", "num_blocks", "z_channels_mults"} & set(entry)
    ):
        raise NotImplementedError(
            f"{path}: embedder {name!r} not in the registry "
            "(embedder.py:99-110 knows vae* and unet*)")
    act = entry.get("activation", "gelu")
    norm = entry.get("normalization", "group")
    if act not in ("gelu", "relu") or norm not in ("group", "batch"):
        raise NotImplementedError(
            f"{path}: {name} uses activation={act}/normalization={norm}; "
            "implemented: gelu/relu x group/batch (unet_small2_yuv and its "
            "quantizable variant)")
    return UNetConfig(
        in_channels=int(entry.get("in_channels", 1)),
        out_channels=int(entry.get("out_channels", 1)),
        z_channels=int(entry.get("z_channels", 16)),
        num_blocks=int(entry.get("num_blocks", 8)),
        z_channels_mults=tuple(entry.get("z_channels_mults", (1, 2, 4, 8))),
        last_tanh=bool(entry.get("last_tanh", True)),
        activation=act,
        normalization=norm,
    )


def load_extractor_config(path: str, img_size: int = 256):
    """extractor.yaml -> the matching registry config. Dispatch mirrors
    ``extractor.py:99-110``: ``convnext*`` -> :class:`ConvNeXtConfig`,
    ``sam*`` -> :class:`SegExtractorConfig` (with ``img_size`` forced by the
    caller like the reference)."""
    from wmar_tpu.sync.syncseal_models import ConvNeXtConfig

    d = _load_yaml(path)
    name = d.get("model", "convnext_tiny")
    entry = d[name]
    if name.startswith("sam") or "pixel_decoder" in entry:
        from wmar_tpu.sync.syncseal_zoo import seg_extractor_config

        return seg_extractor_config(entry, img_size=img_size)
    if not name.startswith("convnext") and not (
        {"encoder", "head"} & set(entry)
    ):
        raise NotImplementedError(
            f"{path}: extractor {name!r} not in the registry "
            "(extractor.py:99-110 knows convnext* and sam*)")
    enc = entry.get("encoder", {})
    head = entry.get("head", {})
    return ConvNeXtConfig(
        depths=tuple(enc.get("depths", (3, 3, 9, 3))),
        dims=tuple(enc.get("dims", (96, 192, 384, 768))),
        out_dim=int(head.get("out_dim", 8)),
    )


def load_attenuation_config(path: str, name: str = "jnd_1_1") -> Tuple[int, int]:
    """attenuation.yaml -> (in_channels, out_channels) of the JND variant.

    Only ``jnd_1_1`` (luminance heatmap applied to the Y delta) is wired
    into ``SyncSealRef.embed01`` — the variant the released checkpoint
    ships with. Other variants raise so a config mismatch is loud."""
    d = _load_yaml(path)
    if name not in d:
        raise ValueError(f"{path}: no attenuation entry {name!r}")
    io = (int(d[name].get("in_channels", 1)), int(d[name].get("out_channels", 1)))
    if io != (1, 1):
        raise NotImplementedError(
            f"attenuation {name} = jnd_{io[0]}_{io[1]}: embed01 implements "
            "jnd_1_1 (the shipped model's variant)")
    return io


# Names in valuemetric_branches() order (syncseal.py) — jpeg has two
# strength branches that share the yaml 'jpeg' weight.
_VALUEMETRIC_NAMES = (
    "identity", "jpeg", "jpeg", "gaussian_blur", "median_filter",
    "brightness", "contrast", "saturation", "hue",
    "gaussian_noise", "grayscale",
)
# sample_geometric_corners switch order.
_GEOMETRIC_NAMES = ("identity", "rotate", "crop", "perspective", "hflip")


@dataclasses.dataclass(frozen=True)
class AugWeights:
    valuemetric: Tuple[float, ...]  # probs over valuemetric_branches()
    geometric: Tuple[float, ...]    # probs over sample_geometric_corners


def load_augs_config(path: Optional[str]) -> Optional[AugWeights]:
    """all_augs.yaml ``augs:`` weights -> normalized sampling probs for the
    two jitted samplers. Unknown yaml families are ignored with the same
    tolerance as the reference's getattr-based builder; families present in
    the bank but absent from the yaml get weight 0."""
    if path is None:
        return None
    augs = _load_yaml(path).get("augs", {})

    def probs(names, split_shared=True):
        w = np.asarray([float(augs.get(n, 0.0)) for n in names], np.float64)
        if split_shared:
            for n in set(names):
                idx = [i for i, m in enumerate(names) if m == n]
                if len(idx) > 1:
                    w[idx] /= len(idx)
        if w.sum() <= 0:
            raise ValueError(f"{path}: all aug weights for {names} are zero")
        return tuple(w / w.sum())

    # The geometric sampler always needs an identity floor: the reference
    # samples identity-vs-crop first (all_augs.yaml comment), so identity
    # mass applies to both samplers.
    return AugWeights(valuemetric=probs(_VALUEMETRIC_NAMES),
                      geometric=probs(_GEOMETRIC_NAMES))


def load_dataset_config(path: str) -> dict:
    """configs/datasets/*.yaml -> {train_dir, val_dir, ...} (train_sync.py:59;
    annotation files are an sa-1b detail the loader passes through)."""
    d = _load_yaml(path)
    if "train_dir" not in d:
        raise ValueError(f"{path}: dataset yaml needs a train_dir key")
    return d
