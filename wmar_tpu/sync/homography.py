"""Homography estimation + perspective warping (SyncSeal's unwarp path).

The reference's SyncSeal detects 8 normalized corner coordinates and undoes
the geometric attack with ``TF.perspective`` (``syncseal/models/scripted.py:
106-192``). Here: solve the 4-point homography as a batched 8x8 linear
system and resample with a jittable bilinear gather — the whole
detect->unwarp path stays on device.

Convention: points are (x, y) in pixels, corner order TL, TR, BL, BR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_homography(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """H mapping src -> dst. ``src, dst: [B, 4, 2]`` -> ``[B, 3, 3]``.

    Solves A h = b for h = (h11..h32), h33 = 1 (the standard DLT system
    for exactly 4 correspondences).
    """

    zero = jnp.float32(0)
    one_ = jnp.float32(1)

    def one(s, d):
        rows, rhs = [], []
        for i in range(4):
            x, y = s[i, 0], s[i, 1]
            u, v = d[i, 0], d[i, 1]
            rows.append(jnp.stack([x, y, one_, zero, zero, zero, -u * x, -u * y]))
            rhs.append(u)
            rows.append(jnp.stack([zero, zero, zero, x, y, one_, -v * x, -v * y]))
            rhs.append(v)
        a = jnp.stack(rows)  # [8, 8]
        b = jnp.stack(rhs)
        h = jnp.linalg.solve(a, b)
        return jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)

    return jax.vmap(one)(src.astype(jnp.float32), dst.astype(jnp.float32))


def warp_perspective(imgs: jnp.ndarray, h_matrix: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Bilinear perspective warp. ``imgs [B, H, W, C]``, ``h_matrix [B, 3, 3]``
    maps OUTPUT pixel coords -> SOURCE coords (inverse warp convention)."""
    b, h, w, c = imgs.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    ones = jnp.ones_like(xx)
    grid = jnp.stack([xx, yy, ones], axis=-1).reshape(-1, 3)  # [HW, 3] as (x, y, 1)

    def one(img, hm):
        src = grid @ hm.T  # [HW, 3]
        sx = src[:, 0] / (src[:, 2] + 1e-8)
        sy = src[:, 1] / (src[:, 2] + 1e-8)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[:, None]
        fy = (sy - y0)[:, None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def gather(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            vals = img[yi, xi]
            return jnp.where(valid[:, None], vals, fill)

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)
        out = (
            v00 * (1 - fx) * (1 - fy)
            + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy
            + v11 * fx * fy
        )
        return out.reshape(h, w, c)

    return jax.vmap(one)(imgs, h_matrix.astype(jnp.float32))


def unwarp_from_corners(imgs: jnp.ndarray, pred_corners: jnp.ndarray) -> jnp.ndarray:
    """Undo a geometric attack given predicted corner positions.

    ``pred_corners [B, 4, 2]``: normalized (x, y) in [0, 1] of where the
    original TL/TR/BL/BR corners ended up. We warp so they return to the
    image corners (the reference's ``SyncModelJIT.unwarp``)."""
    b, h, w, _ = imgs.shape
    canon = jnp.asarray([[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]])
    canon = jnp.tile(canon[None], (b, 1, 1))
    pred_px = pred_corners * jnp.asarray([w - 1.0, h - 1.0])
    # Inverse warp: for each output pixel (canonical grid), find source pixel
    # in the attacked image -> H maps canonical -> attacked.
    h_matrix = solve_homography(canon, pred_px)
    return warp_perspective(imgs, h_matrix)
