"""FID evaluation: InceptionV3 (FID variant) port + Frechet distance.

The reference emits an ``--orig_only`` result layout for external FID
tooling (``generate.py``; the paper reports FID but the repo ships no
scorer). This module completes that workflow in-repo:

- A weight-compatible functional port of the *FID* InceptionV3 — the
  pytorch-fid / TF-"inception-2015-12-05" variant of torchvision's
  ``inception_v3``: BasicConv2d (conv + BN(eps 1e-3) + relu), Inception
  A/B/C/D/E towers, with the FID quirks: tower average pools use
  ``count_include_pad=False``, and the last block's (Mixed_7c) pool branch
  is a *max* pool in the TF port. Features = the 2048-d final average pool
  ("pool3").
- ``convert_inception``: torchvision/pytorch-fid state-dict naming
  (``Conv2d_1a_3x3.conv.weight``, ``Mixed_5b.branch1x1.bn.running_mean``,
  ...); shape-driven, so reduced-width oracles convert too.
- ``frechet_distance``: ||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrtm(S1 S2)) with
  the standard eps-jitter fallback for non-finite matrix square roots.
- ``compute_statistics`` / ``fid_from_dirs``: batched jitted activation
  extraction over image arrays or PNG directories (the generate.py
  ``orig_only`` tree), bilinear-resized to 299 and scaled to [-1, 1]
  exactly like pytorch-fid's ``resize_input=True, normalize_input=True``.

CLI: ``python -m wmar_tpu.eval.fid DIR1 DIR2 --weights pt_inception.pth``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _bconv(p, x, stride=1, pad=(0, 0)):
    """BasicConv2d: conv(no bias) -> BN(eps=0.001) -> relu."""
    if isinstance(pad, int):
        pad = (pad, pad)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride),
        ((pad[0], pad[0]), (pad[1], pad[1])), dimension_numbers=DN,
    )
    inv = jax.lax.rsqrt(p["var"] + 1e-3)
    return jax.nn.relu((y - p["mean"]) * inv * p["scale"] + p["bias"])


def _bconv_rect(p, x, pad):
    """1x7 / 7x1 style convs: padding given as (ph, pw)."""
    return _bconv(p, x, stride=1, pad=pad)


def _max_pool(x, k=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avg_pool_nip(x, k=3):
    """3x3 stride-1 average pool, count_include_pad=False (the FID blocks)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    win = (1, k, k, 1)
    strides = (1, 1, 1, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, win, strides, pads)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, win, strides, pads)
    return s / n


# ---------------------------------------------------------------------------
# inception towers (torchvision topology; channels come from the params)
# ---------------------------------------------------------------------------


def _inception_a(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b5 = _bconv(p["branch5x5_2"], _bconv(p["branch5x5_1"], x), pad=2)
    b3 = _bconv(p["branch3x3dbl_1"], x)
    b3 = _bconv(p["branch3x3dbl_2"], b3, pad=1)
    b3 = _bconv(p["branch3x3dbl_3"], b3, pad=1)
    bp = _bconv(p["branch_pool"], _avg_pool_nip(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _bconv(p["branch3x3"], x, stride=2)
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=1)
    bd = _bconv(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b7 = _bconv(p["branch7x7_1"], x)
    b7 = _bconv_rect(p["branch7x7_2"], b7, pad=(0, 3))
    b7 = _bconv_rect(p["branch7x7_3"], b7, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_1"], x)
    bd = _bconv_rect(p["branch7x7dbl_2"], bd, pad=(3, 0))
    bd = _bconv_rect(p["branch7x7dbl_3"], bd, pad=(0, 3))
    bd = _bconv_rect(p["branch7x7dbl_4"], bd, pad=(3, 0))
    bd = _bconv_rect(p["branch7x7dbl_5"], bd, pad=(0, 3))
    bp = _bconv(p["branch_pool"], _avg_pool_nip(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _bconv(p["branch3x3_2"], _bconv(p["branch3x3_1"], x), stride=2)
    b7 = _bconv(p["branch7x7x3_1"], x)
    b7 = _bconv_rect(p["branch7x7x3_2"], b7, pad=(0, 3))
    b7 = _bconv_rect(p["branch7x7x3_3"], b7, pad=(3, 0))
    b7 = _bconv(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, max_pool_branch: bool):
    b1 = _bconv(p["branch1x1"], x)
    b3 = _bconv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _bconv_rect(p["branch3x3_2a"], b3, pad=(0, 1)),
        _bconv_rect(p["branch3x3_2b"], b3, pad=(1, 0)),
    ], axis=-1)
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=1)
    bd = jnp.concatenate([
        _bconv_rect(p["branch3x3dbl_3a"], bd, pad=(0, 1)),
        _bconv_rect(p["branch3x3dbl_3b"], bd, pad=(1, 0)),
    ], axis=-1)
    if max_pool_branch:  # FIDInceptionE_2 (Mixed_7c): TF port uses max pool
        bp = _max_pool(x, k=3, stride=1, pad=1)
    else:
        bp = _avg_pool_nip(x)
    bp = _bconv(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x NHWC in [-1, 1] (any spatial size >= 75) -> pool3 features [B, C].

    Topology of torchvision ``inception_v3`` up to the final average pool,
    with the FID pool quirks (see module docstring).
    """
    h = _bconv(params["Conv2d_1a_3x3"], x, stride=2)
    h = _bconv(params["Conv2d_2a_3x3"], h)
    h = _bconv(params["Conv2d_2b_3x3"], h, pad=1)
    h = _max_pool(h)
    h = _bconv(params["Conv2d_3b_1x1"], h)
    h = _bconv(params["Conv2d_4a_3x3"], h)
    h = _max_pool(h)
    h = _inception_a(params["Mixed_5b"], h)
    h = _inception_a(params["Mixed_5c"], h)
    h = _inception_a(params["Mixed_5d"], h)
    h = _inception_b(params["Mixed_6a"], h)
    h = _inception_c(params["Mixed_6b"], h)
    h = _inception_c(params["Mixed_6c"], h)
    h = _inception_c(params["Mixed_6d"], h)
    h = _inception_c(params["Mixed_6e"], h)
    h = _inception_d(params["Mixed_7a"], h)
    h = _inception_e(params["Mixed_7b"], h, max_pool_branch=False)
    h = _inception_e(params["Mixed_7c"], h, max_pool_branch=True)
    return h.mean(axis=(1, 2))  # adaptive avg pool to 1x1


def preprocess(imgs01: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """[0,1] NHWC -> bilinear resize to (size,size) -> [-1,1] (pytorch-fid's
    resize_input + normalize_input)."""
    b, h, w, c = imgs01.shape
    if (h, w) != (size, size):
        imgs01 = jax.image.resize(imgs01, (b, size, size, c), "bilinear")
    return 2.0 * imgs01 - 1.0


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

_BLOCK_BRANCHES = {
    "a": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
          "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "b": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "c": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
          "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
          "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "d": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
          "branch7x7x3_3", "branch7x7x3_4"],
    "e": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
          "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
          "branch3x3dbl_3b", "branch_pool"],
}

_LAYOUT = [
    ("Conv2d_1a_3x3", None), ("Conv2d_2a_3x3", None), ("Conv2d_2b_3x3", None),
    ("Conv2d_3b_1x1", None), ("Conv2d_4a_3x3", None),
    ("Mixed_5b", "a"), ("Mixed_5c", "a"), ("Mixed_5d", "a"),
    ("Mixed_6a", "b"),
    ("Mixed_6b", "c"), ("Mixed_6c", "c"), ("Mixed_6d", "c"), ("Mixed_6e", "c"),
    ("Mixed_7a", "d"),
    ("Mixed_7b", "e"), ("Mixed_7c", "e"),
]


def _cv_bn(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(
            np.transpose(np.asarray(sd[prefix + ".conv.weight"]), (2, 3, 1, 0))),
        "scale": np.asarray(sd[prefix + ".bn.weight"]),
        "bias": np.asarray(sd[prefix + ".bn.bias"]),
        "mean": np.asarray(sd[prefix + ".bn.running_mean"]),
        "var": np.asarray(sd[prefix + ".bn.running_var"]),
    }


def convert_inception(sd) -> dict:
    """torchvision/pytorch-fid InceptionV3 state dict -> forward params.

    Ignores the classifier (``fc``) and aux heads; shape-driven, so
    reduced-width test oracles convert identically.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, dict] = {}
    for name, kind in _LAYOUT:
        if kind is None:
            params[name] = _cv_bn(sd, name)
        else:
            params[name] = {b: _cv_bn(sd, f"{name}.{b}") for b in _BLOCK_BRANCHES[kind]}
    return params


# ---------------------------------------------------------------------------
# statistics + Frechet distance
# ---------------------------------------------------------------------------


def compute_activations(params, imgs01: np.ndarray, batch_size: int = 32) -> np.ndarray:
    """[N,H,W,3] in [0,1] -> [N, 2048] pool3 features (jitted per shape)."""
    fn = jax.jit(lambda p, x: inception_pool3(p, preprocess(x)))
    feats: List[np.ndarray] = []
    n = imgs01.shape[0]
    for i in range(0, n, batch_size):
        chunk = jnp.asarray(imgs01[i : i + batch_size], jnp.float32)
        if chunk.shape[0] < batch_size and i > 0:
            padded = jnp.zeros((batch_size,) + chunk.shape[1:], chunk.dtype)
            padded = padded.at[: chunk.shape[0]].set(chunk)
            feats.append(np.asarray(fn(params, padded))[: chunk.shape[0]])
        else:
            feats.append(np.asarray(fn(params, chunk)))
    return np.concatenate(feats, axis=0)


def compute_statistics(params, imgs01: np.ndarray, batch_size: int = 32):
    acts = compute_activations(params, imgs01, batch_size)
    mu = acts.mean(axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """pytorch-fid's calculate_frechet_distance, including the eps-jitter
    retry and imaginary-part check."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


# ---------------------------------------------------------------------------
# directory workflow (the generate.py --orig_only tree)
# ---------------------------------------------------------------------------


def _load_images(path: str, limit: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    files = sorted(
        os.path.join(root, f)
        for root, _, fs in os.walk(path)
        for f in fs if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    imgs = [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0 for f in files]
    return np.stack(imgs)


def fid_from_dirs(params, dir1: str, dir2: str, batch_size: int = 32,
                  limit: Optional[int] = None) -> float:
    m1, s1 = compute_statistics(params, _load_images(dir1, limit), batch_size)
    m2, s2 = compute_statistics(params, _load_images(dir2, limit), batch_size)
    return frechet_distance(m1, s1, m2, s2)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("dirs", nargs=2, help="two image directories (or .npz stats files)")
    p.add_argument("--weights", required=True,
                   help="pt_inception/torchvision inception_v3 state dict (.pth)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--save_stats", type=str, default=None,
                   help="save (mu, sigma) of dirs[0] to this .npz and exit")
    args = p.parse_args(argv)

    from wmar_tpu.utils.convert import load_torch_state_dict

    params = jax.tree.map(jnp.asarray, convert_inception(load_torch_state_dict(args.weights)))

    def stats(path):
        if path.endswith(".npz"):
            z = np.load(path)
            return z["mu"], z["sigma"]
        return compute_statistics(params, _load_images(path, args.limit), args.batch_size)

    if args.save_stats:
        mu, sigma = stats(args.dirs[0])
        np.savez(args.save_stats, mu=mu, sigma=sigma)
        print(f"saved stats to {args.save_stats}")
        return 0
    m1, s1 = stats(args.dirs[0])
    m2, s2 = stats(args.dirs[1])
    print(f"FID: {frechet_distance(m1, s1, m2, s2):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
