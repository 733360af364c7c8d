"""Neural compression attacks (compressai zoo + diffusers VAEs).

Counterpart of ``wmar/augmentations/neuralcompression.py``. The compressai
families are exact, weight-compatible JAX ports (see ``compressai_jax``):
same reconstructions and the same likelihood-based bpp as the reference's
``compute_bpp`` (``neuralcompression.py:66-71``). Diffusers VAEs are Flax
ports convertible from the published state dicts (``diffusers_vae``).

A codec evaluated with random weights is image *destruction*, not a
compression attack — so ``NeuralCompression.from_name`` refuses to build
without weights unless ``allow_random=True`` is passed explicitly, and a
random-weight codec prints a loud warning and tags itself so the eval
pipeline can mark its rows.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.augmentations import compressai_jax as cj

#: the reference's canonical 22-codec grid (augmentation_manager.py:74-97)
REFERENCE_CODEC_NAMES = [
    f"{fam}-q={q}"
    for fam in (
        "bmshj2018-factorized", "bmshj2018-hyperprior",
        "mbt2018-mean", "mbt2018", "cheng2020-anchor", "cheng2020-attn",
    )
    for q in (1, 3, 6)
] + [
    "diffusers-sd-vae-ft-ema", "diffusers-sd-vae-fp16",
    "diffusers-deep-compression", "diffusers-flux",
]


# ---------------------------------------------------------------------------
# random init (tiny-config tests / explicitly-acknowledged random codecs)
# ---------------------------------------------------------------------------


def _rng_conv(rng, k, i, o, groups=1):
    fan_in = i * k * k
    kern = rng.normal(0, (2.0 / fan_in) ** 0.5, size=(k, k, i, o)).astype(np.float32)
    return {"kernel": kern, "bias": np.zeros((o,), np.float32)}


def _rng_gdn(c):
    return {"beta": np.ones((c,), np.float32),
            "gamma_t": (0.1 * np.eye(c)).astype(np.float32)}


def _rng_eb(rng, c, filters=(3, 3, 3, 3), init_scale=10.0):
    fs = (1,) + tuple(filters) + (1,)
    scale = init_scale ** (1.0 / (len(filters) + 1))
    mats, biases, factors = [], [], []
    for i in range(len(filters) + 1):
        init = float(np.log(np.expm1(1.0 / scale / fs[i + 1])))
        mats.append(np.full((c, fs[i + 1], fs[i]), init, np.float32))
        biases.append(rng.uniform(-0.5, 0.5, size=(c, fs[i + 1], 1)).astype(np.float32))
        if i < len(filters):
            factors.append(np.zeros((c, fs[i + 1], 1), np.float32))
    q = np.tile(np.array([[-init_scale, 0.0, init_scale]], np.float32), (c, 1)).reshape(c, 1, 3)
    return {"matrices": mats, "biases": biases, "factors": factors, "quantiles": q}


def _rng_ga(rng, n, m):
    return [
        _rng_conv(rng, 5, 3, n), _rng_gdn(n), _rng_conv(rng, 5, n, n), _rng_gdn(n),
        _rng_conv(rng, 5, n, n), _rng_gdn(n), _rng_conv(rng, 5, n, m),
    ]


def _rng_gs(rng, n, m):
    return [
        _rng_conv(rng, 5, m, n), _rng_gdn(n), _rng_conv(rng, 5, n, n), _rng_gdn(n),
        _rng_conv(rng, 5, n, n), _rng_gdn(n), _rng_conv(rng, 5, n, 3),
    ]


def _rng_rb(rng, i, o):
    p = {"conv1": _rng_conv(rng, 3, i, o), "conv2": _rng_conv(rng, 3, o, o)}
    if i != o:
        p["skip"] = _rng_conv(rng, 1, i, o)
    return p


def _rng_rbs(rng, i, o):
    return {"conv1": _rng_conv(rng, 3, i, o), "conv2": _rng_conv(rng, 3, o, o),
            "gdn": _rng_gdn(o), "skip": _rng_conv(rng, 1, i, o)}


def _rng_rbu(rng, i, o, r=2):
    return {"subpel": _rng_conv(rng, 3, i, o * r * r), "conv": _rng_conv(rng, 3, o, o),
            "igdn": _rng_gdn(o), "upsample": _rng_conv(rng, 3, i, o * r * r)}


def _rng_attn(rng, n):
    def unit():
        return {"conv1": _rng_conv(rng, 1, n, n // 2),
                "conv2": _rng_conv(rng, 3, n // 2, n // 2),
                "conv3": _rng_conv(rng, 1, n // 2, n)}

    return {"conv_a": [unit() for _ in range(3)],
            "conv_b": [unit() for _ in range(3)] + [_rng_conv(rng, 1, n, n)]}


def init_compressai_params(seed: int, arch: str, n: int, m: int) -> dict:
    """Random params matching ``convert_compressai``'s output shapes."""
    rng = np.random.default_rng(seed)
    if arch == "bmshj2018-factorized":
        return {"g_a": _rng_ga(rng, n, m), "g_s": _rng_gs(rng, n, m), "eb": _rng_eb(rng, m)}
    if arch == "bmshj2018-hyperprior":
        return {
            "g_a": _rng_ga(rng, n, m), "g_s": _rng_gs(rng, n, m),
            "h_a": [_rng_conv(rng, 3, m, n), _rng_conv(rng, 5, n, n), _rng_conv(rng, 5, n, n)],
            "h_s": [_rng_conv(rng, 5, n, n), _rng_conv(rng, 5, n, n), _rng_conv(rng, 3, n, m)],
            "eb": _rng_eb(rng, n),
        }
    if arch in ("mbt2018-mean", "mbt2018"):
        p = {
            "g_a": _rng_ga(rng, n, m), "g_s": _rng_gs(rng, n, m),
            "h_a": [_rng_conv(rng, 3, m, n), _rng_conv(rng, 5, n, n), _rng_conv(rng, 5, n, n)],
            "h_s": [_rng_conv(rng, 5, n, m), _rng_conv(rng, 5, m, m * 3 // 2),
                    _rng_conv(rng, 3, m * 3 // 2, 2 * m)],
            "eb": _rng_eb(rng, n),
        }
        if arch == "mbt2018":
            p["context_prediction"] = _rng_conv(rng, 5, m, 2 * m)
            p["entropy_parameters"] = [
                _rng_conv(rng, 1, m * 4, m * 10 // 3),
                _rng_conv(rng, 1, m * 10 // 3, m * 8 // 3),
                _rng_conv(rng, 1, m * 8 // 3, m * 2),
            ]
        return p
    if arch in ("cheng2020-anchor", "cheng2020-attn"):
        attn = arch == "cheng2020-attn"
        g_a = [_rng_rbs(rng, 3, n), _rng_rb(rng, n, n), _rng_rbs(rng, n, n)]
        if attn:
            g_a.append(_rng_attn(rng, n))
        g_a += [_rng_rb(rng, n, n), _rng_rbs(rng, n, n), _rng_rb(rng, n, n),
                _rng_conv(rng, 3, n, n)]
        if attn:
            g_a.append(_rng_attn(rng, n))
        g_s = [_rng_attn(rng, n)] if attn else []
        g_s += [_rng_rb(rng, n, n), _rng_rbu(rng, n, n), _rng_rb(rng, n, n), _rng_rbu(rng, n, n)]
        if attn:
            g_s.append(_rng_attn(rng, n))
        g_s += [_rng_rb(rng, n, n), _rng_rbu(rng, n, n), _rng_rb(rng, n, n),
                _rng_conv(rng, 3, n, 3 * 4)]
        return {
            "g_a": g_a, "g_s": g_s,
            "h_a": [_rng_conv(rng, 3, n, n)] * 2 + [_rng_conv(rng, 3, n, n)] * 3,
            "h_s": [_rng_conv(rng, 3, n, n), _rng_conv(rng, 3, n, n * 4),
                    _rng_conv(rng, 3, n, n * 3 // 2),
                    _rng_conv(rng, 3, n * 3 // 2, n * 3 // 2 * 4),
                    _rng_conv(rng, 3, n * 3 // 2, n * 2)],
            "context_prediction": _rng_conv(rng, 5, n, 2 * n),
            "entropy_parameters": [
                _rng_conv(rng, 1, n * 4, n * 10 // 3),
                _rng_conv(rng, 1, n * 10 // 3, n * 8 // 3),
                _rng_conv(rng, 1, n * 8 // 3, n * 2),
            ],
            "eb": _rng_eb(rng, n),
        }
    raise ValueError(arch)


# ---------------------------------------------------------------------------
# attack wrapper
# ---------------------------------------------------------------------------


class RandomWeightsError(RuntimeError):
    """Raised when a pretrained codec is requested but no weights exist."""


class NeuralCompression:
    """Callable attack: imgs01 [B,H,W,3] -> compressed imgs01.

    Mirrors the reference wrapper (``neuralcompression.py:54-116``): resizes
    non-factorized inputs to a multiple of 64, runs the codec round-trip,
    clamps to [0,1]; ``return_bpp=True`` also returns the exact
    likelihood-based bits-per-pixel.
    """

    def __init__(self, name: str, forward, params, random_weights: bool = False):
        self.name = name
        self.params = jax.tree.map(jnp.asarray, params)
        self.random_weights = random_weights
        self._forward = forward
        self._fn = jax.jit(forward)

    def __call__(self, imgs01, return_bpp: bool = False):
        b, h, w, _ = imgs01.shape
        arch_needs_64 = not self.name.startswith("bmshj2018-factorized")
        h64 = max((h // 64) * 64, 64) if arch_needs_64 else h
        w64 = max((w // 64) * 64, 64) if arch_needs_64 else w
        x = imgs01
        if (h64, w64) != (h, w):
            x = jax.image.resize(x, (b, h64, w64, x.shape[-1]), "bilinear")
        rec, liks = self._fn(self.params, x)
        if rec.shape != imgs01.shape:
            rec = jax.image.resize(rec, imgs01.shape, "bilinear")
        rec = jnp.clip(rec, 0.0, 1.0)
        if return_bpp:
            bpp = cj.bpp_from_likelihoods(liks, b * h64 * w64)
            return rec, bpp
        return rec

    def __repr__(self):
        tag = " (RANDOM WEIGHTS)" if self.random_weights else ""
        return f"NeuralCompression({self.name}{tag})"

    @staticmethod
    def from_name(
        name: str,
        weights_dir: Optional[str] = None,
        allow_random: bool = False,
        image_size: int = 256,
        tiny: Optional[Tuple[int, int]] = None,
    ) -> "NeuralCompression":
        """Build a codec by reference name, e.g. ``cheng2020-anchor-q=3``.

        Weights resolution order inside ``weights_dir``: ``{name}.msgpack``
        (converted pytree) then ``{name}.pth``/``.pth.tar`` (raw compressai
        checkpoint, converted on the fly). Without weights this *raises*
        ``RandomWeightsError`` unless ``allow_random=True`` — a random codec
        is not a compression attack (VERDICT r1).

        ``tiny=(N, M)`` overrides the zoo channel sizes for tests.
        """
        if name.startswith("diffusers"):
            from wmar_tpu.augmentations.diffusers_vae import DiffusersCompression

            return DiffusersCompression.from_name(
                name, weights_dir=weights_dir, allow_random=allow_random,
                image_size=image_size, tiny=tiny is not None,
            )
        arch, q = cj.parse_codec_name(name)
        if arch not in cj.FORWARDS:
            raise ValueError(f"unknown codec {name}")
        params = _load_codec_weights(name, arch, weights_dir)
        random_weights = params is None
        if random_weights:
            if not allow_random and tiny is None:
                raise RandomWeightsError(
                    f"no weights for codec '{name}' in {weights_dir!r}; a random-"
                    "weight codec destroys images instead of compressing them. "
                    "Provide --nc_weights_dir with converted checkpoints, or pass "
                    "allow_random=True to acknowledge."
                )
            n, m = tiny if tiny is not None else cj.quality_nm(arch, q or 3)
            params = init_compressai_params(0, arch, n, m)
            if tiny is None:
                print(f"WARNING: codec {name} running with RANDOM weights — "
                      "its rows measure destruction, not compression.")
        return NeuralCompression(name, cj.FORWARDS[arch], params,
                                 random_weights=random_weights and tiny is None)


def _load_codec_weights(name: str, arch: str, weights_dir: Optional[str]):
    if not weights_dir:
        return None
    msg = os.path.join(weights_dir, name + ".msgpack")
    if os.path.exists(msg):
        from wmar_tpu.utils import checkpoint as _ckpt

        q = cj.parse_codec_name(name)[1]
        n, m = cj.quality_nm(arch, q or 3)
        like = init_compressai_params(0, arch, n, m)
        return _ckpt.load_pytree(msg, like)
    for ext in (".pth", ".pth.tar"):
        raw = os.path.join(weights_dir, name + ext)
        if os.path.exists(raw):
            from wmar_tpu.utils.convert import load_torch_state_dict

            return cj.convert_compressai(load_torch_state_dict(raw), arch)
    return None


def build_codec_bank(
    names=None,
    weights_dir: Optional[str] = None,
    allow_random: bool = False,
    image_size: int = 256,
) -> Dict[str, "NeuralCompression"]:
    """Build the reference's 22-codec bank; skips codecs whose weights are
    missing (with a message) rather than silently registering random ones."""
    bank = {}
    for name in names or REFERENCE_CODEC_NAMES:
        try:
            bank[name] = NeuralCompression.from_name(
                name, weights_dir=weights_dir, allow_random=allow_random,
                image_size=image_size,
            )
        except RandomWeightsError as e:
            print(f"skipping codec {name}: {e}")
        except Exception as e:  # noqa: BLE001 — converter/layout errors
            print(f"skipping codec {name}: {type(e).__name__}: {e}")
    return bank
