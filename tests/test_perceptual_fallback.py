"""Laplacian-pyramid fallback vs the LPIPS functional form.

VERDICT r3 weak #4: hermetic RCC runs use `laplacian_pyramid_l1` when
`lpips_vgg.msgpack` is absent, and nothing validated it behaves like the
objective it stands in for. Trained VGG weights are unfetchable here (zero
egress), so this validates the next-best hermetic claim: across a bank of
distortions at graded strengths, the fallback must (a) be monotone in
distortion strength, and (b) rank-correlate with a randomly-initialized
LPIPS (the untrained multi-scale VGG distance — the functional form the
trained metric refines; untrained-VGG perceptual distances are a standard
baseline). If the fallback ordered distortions differently from the LPIPS
family, CI-trained RCC quality would be evidence about a different
objective; this pins the ordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.augmentations import valuemetric as V
from wmar_tpu.finetune.perceptual import LPIPS, laplacian_pyramid_l1


def _structured_images(n=4, s=64, seed=0):
    """Smooth gradients + blobs: natural-image-ish spectra, in [-1, 1]."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:s, 0:s] / s
    imgs = []
    for i in range(n):
        base = np.stack([
            np.sin(2 * np.pi * (xx * rng.uniform(1, 3) + rng.uniform())),
            np.cos(2 * np.pi * (yy * rng.uniform(1, 3) + rng.uniform())),
            xx * yy,
        ], axis=-1)
        for _ in range(3):
            cy, cx, r = rng.uniform(0.2, 0.8, 3)
            blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (0.05 * r)))
            base += blob[..., None] * rng.uniform(-1, 1, 3)
        imgs.append(base)
    x = np.stack(imgs).astype(np.float32)
    return np.clip(x / np.abs(x).max(), -1, 1)


def _distortion_bank(x, rng):
    out = {}
    for s in (0.02, 0.05, 0.1, 0.2):
        out[f"noise:{s}"] = (np.clip(
            x + np.asarray(jax.random.normal(rng, x.shape)) * 2 * s, -1, 1), s)
    for k in (3, 5, 9):
        out[f"blur:{k}"] = (np.asarray(V.gaussian_blur(jnp.asarray(x), k)), k)
    for f in (1.25, 1.75, 2.5):
        out[f"brightness:{f}"] = (np.asarray(V.brightness(jnp.asarray(x), f)), f)
    return out


def test_fallback_monotone_and_rank_correlates_with_lpips_form():
    x = _structured_images()
    bank = _distortion_bank(x, jax.random.PRNGKey(0))

    lpips = LPIPS()
    params = lpips.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(x))
    # random lin heads can be negative; LPIPS convention is non-negative heads
    params = jax.tree.map(jnp.abs, params)

    d_fb, d_lp = {}, {}
    for name, (y, _) in bank.items():
        d_fb[name] = float(laplacian_pyramid_l1(jnp.asarray(x), jnp.asarray(y)).mean())
        d_lp[name] = float(lpips.apply(params, jnp.asarray(x), jnp.asarray(y)).mean())

    # (a) monotone in strength within each family. LPIPS unit-normalizes
    # features per spatial position, so it is near-insensitive to global
    # brightness BY DESIGN — only the fallback is asserted monotone there
    # (the reference's objective pairs LPIPS with a plain L1 term,
    # vqperceptual.py, which covers brightness the same way the fallback
    # does; the two metrics legitimately diverge on that family).
    for fam in ("noise", "blur", "brightness"):
        keys = [k for k in bank if k.startswith(fam)]
        keys.sort(key=lambda k: float(k.split(":")[1]))
        metrics = (d_fb,) if fam == "brightness" else (d_fb, d_lp)
        for d in metrics:
            vals = [d[k] for k in keys]
            assert all(a < b for a, b in zip(vals, vals[1:])), (fam, d is d_fb, vals)

    # (b) rank correlation over the structural distortions (noise + blur)
    names = sorted(k for k in bank if not k.startswith("brightness"))
    a = np.argsort(np.argsort([d_fb[n] for n in names]))
    b = np.argsort(np.argsort([d_lp[n] for n in names]))
    n = len(names)
    spearman = 1 - 6 * ((a - b) ** 2).sum() / (n * (n**2 - 1))
    assert spearman > 0.7, (spearman, dict(zip(names, zip(a, b))))
