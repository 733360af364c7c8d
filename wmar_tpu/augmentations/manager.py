"""The canonical attack registry for robustness evaluation.

Mirrors ``wmar/augmentations/augmentation_manager.py:33-123``: same attack
names and parameter grids, so result trees and the analyzer line up with the
reference. Each attack is ``fn(imgs_01, param, rng) -> imgs_01`` over NHWC
float images; most are jittable device transforms (the eval loop compiles
one program per (attack, param)); ``jpeg`` optionally switches to the exact
host PIL codec for strict parity runs.

Neural-compression and DiffPure slots exist behind flags like the reference
(``generate.py:276-278``); they register only if their weights/backends are
available (see ``wmar_tpu.augmentations.neural`` / ``diffpure``).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.augmentations import geometric as G
from wmar_tpu.augmentations import valuemetric as V

AugFn = Callable[[jnp.ndarray, object, jax.Array], jnp.ndarray]
AugEntry = Tuple[str, AugFn, Sequence[object]]


def _no_rng(fn):
    return lambda imgs, param, rng: fn(imgs, param)


def make_jpeg_fn(exact_pil: bool) -> AugFn:
    if not exact_pil:
        return lambda imgs, q, rng: V.jpeg_diff(imgs, int(q))

    def jpeg_host(imgs, q, rng):
        out = V.jpeg_pil(np.asarray(imgs), int(q))
        return jnp.asarray(out)

    return jpeg_host


class AugmentationManager:
    """Reference-compatible attack registry.

    Args:
      include_neural_compress: register neural codec slots (requires ported
        codec weights; silently skipped if unavailable).
      include_diffpure: register DiffPure slots (requires the guided
        diffusion port + weights).
      exact_jpeg: use PIL on the host instead of the in-graph JPEG.
    """

    def __init__(
        self,
        include_neural_compress: bool = False,
        include_diffpure: bool = False,
        exact_jpeg: bool = False,
        nc_models: Optional[dict] = None,
        diffpure=None,
    ):
        self.augs: List[AugEntry] = [
            ("gaussian-blur", _no_rng(lambda x, k: V.gaussian_blur(x, int(k))),
             [0, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19]),
            ("gaussian-noise", lambda x, s, rng: V.gaussian_noise(x, float(s), rng),
             [0, 0.025, 0.05, 0.075, 0.1, 0.125, 0.15, 0.175, 0.2]),
            ("jpeg", make_jpeg_fn(exact_jpeg),
             [100, 95, 85, 75, 65, 55, 45, 35, 25, 15, 5]),
            ("brightness", _no_rng(lambda x, f: V.brightness(x, float(f))),
             [1, 1.25, 1.5, 1.75, 2, 2.25, 2.5, 2.75, 3]),
            ("rotation", _no_rng(lambda x, a: G.rotate(x, float(a))),
             [-20, -15, -10, -5, 0, 5, 10, 15, 20]),
            ("flip-h", _no_rng(lambda x, do: G.hflip(x) if do else x), [0, 1]),
            ("upperleft-crop", _no_rng(lambda x, f: G.upper_left_crop_resize_back(x, float(f))),
             [1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65, 0.6, 0.55, 0.5]),
        ]
        self.exact_jpeg = exact_jpeg  # host-PIL jpeg can't be jitted
        self.compressors = nc_models or {}
        #: (transform, param) -> extra fields merged into result records
        #: (marks random-weight codec rows so they can't pass as real attacks)
        self.row_tags = {}
        if include_neural_compress and self.compressors:
            names = sorted(self.compressors)
            self.augs.append(
                ("neural-compress", self._run_codec, names)
            )
            for name, codec in self.compressors.items():
                if getattr(codec, "random_weights", False):
                    self.row_tags[("neural-compress", name)] = {"random_weights": True}
        if include_diffpure and diffpure is not None:
            self.diffpure = diffpure
            self.augs.append(
                ("diffpure", lambda x, steps, rng: diffpure(x, float(steps), rng),
                 [0.01, 0.05, 0.1, 0.2, 0.3])
            )

    def _run_codec(self, x, name, rng):
        """Run one neural codec and record its exact bpp into row_tags so the
        analyzer's TPR-vs-bpp axis has real rate values (analyzer.py:237)."""
        rec, bpp = self.compressors[name](x, return_bpp=True)
        tag = self.row_tags.setdefault(("neural-compress", name), {})
        tag["bpp"] = float(bpp)
        return rec

    def names(self) -> List[str]:
        return [name for name, _, _ in self.augs]
