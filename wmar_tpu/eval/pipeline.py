"""Generation -> attack -> detect evaluation pipeline.

TPU-native counterpart of ``generate.py:37-232`` in the reference: sample a
batch of watermarked codes, decode to images, round-trip them through the
tokenizer T times, sweep the attack grid, re-tokenize, and compute metrics
(p-value / L0 token mismatch / PSNR) per (method, transform, param, sample).

Results are written in the reference's on-disk layout so its analyzer
workflow carries over:

    outdir/c={cond},idx={k}/{k:04}_{method}_{transform}_{param}.{png,npy,json}

The heavy parts (decode, attack, re-encode, detection) are jitted device
programs; only PNG/JSON writing touches the host.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.augmentations.manager import AugmentationManager
from wmar_tpu.core.detect import detect
from wmar_tpu.utils.metrics import l0_token_mismatch, psnr_pm1


@dataclasses.dataclass
class EvalParams:
    max_roundtrips: int = 1
    metric_names: Sequence[str] = ("pvalue", "l0", "psnr")
    orig_only: bool = False
    save_images: bool = True


def to_pillow(img_pm1: np.ndarray):
    """NHWC [-1,1] float -> PIL image."""
    from PIL import Image

    arr = np.clip((np.asarray(img_pm1) + 1.0) / 2.0 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return Image.fromarray(arr)


def fill_batch_log(
    wrapper,
    codes: jnp.ndarray,
    aug_manager: Optional[AugmentationManager],
    eval_params: EvalParams,
    rng: jax.Array,
    sync_manager=None,
) -> Dict[str, List[Tuple[Any, np.ndarray, np.ndarray]]]:
    """Build the {transform: [(param, codes, imgs)]} log for one batch.

    Mirrors ``generate.py:111-164``: entry 0 of "roundtrips" is the original
    (codes, image); each attack re-tokenizes the *synced* original image.
    """
    imgs = wrapper.codes_to_images(codes)  # [-1, 1] NHWC
    if sync_manager is not None:
        imgs = sync_manager.add_sync(imgs)
    log: Dict[str, List[Tuple[Any, np.ndarray, np.ndarray]]] = {}
    log["roundtrips"] = [(0, np.asarray(codes), np.asarray(imgs))]

    cur = imgs
    for t in range(1, eval_params.max_roundtrips + 1):
        if sync_manager is not None:
            cur_nosync = sync_manager.remove_sync(cur)
            cur_codes = wrapper.images_to_codes(cur_nosync)
        else:
            cur_codes = wrapper.images_to_codes(cur)
        cur = wrapper.codes_to_images(cur_codes)
        log["roundtrips"].append((t, np.asarray(cur_codes), np.asarray(cur)))

    if aug_manager is not None:
        # jit each (attack, param) once: classic augs otherwise run op-by-op
        # through the dispatch layer on every batch (~60 combos per sweep)
        jit_cache = getattr(aug_manager, "_jit_cache", None)
        if jit_cache is None:
            jit_cache = aug_manager._jit_cache = {}
        for ai, (name, fn, params) in enumerate(aug_manager.augs):
            rows = []
            for pi, param in enumerate(params):
                imgs01 = imgs / 2.0 + 0.5
                key = (name, repr(param))
                jfn = jit_cache.get(key)
                if jfn is None:
                    if name in ("neural-compress", "diffpure") or (
                        name == "jpeg" and getattr(aug_manager, "exact_jpeg", False)
                    ):
                        jfn = lambda x, r, fn=fn, param=param: fn(x, param, r)
                    else:
                        jfn = jax.jit(lambda x, r, fn=fn, param=param: fn(x, param, r))
                    jit_cache[key] = jfn
                a01 = jfn(imgs01, jax.random.fold_in(rng, ai * 1000 + pi))
                a = jnp.clip(a01, 0.0, 1.0) * 2.0 - 1.0
                if sync_manager is not None:
                    a_nosync = sync_manager.remove_sync(a)
                    a_codes = wrapper.images_to_codes(a_nosync)
                else:
                    a_codes = wrapper.images_to_codes(a)
                rows.append((param, np.asarray(a_codes), np.asarray(a)))
            log[name] = rows
    return log


def compute_and_save_batch(
    log: Dict[str, List[Tuple[Any, np.ndarray, np.ndarray]]],
    outdir: str,
    method: str,
    conditionings: Sequence[Any],
    cond_indices: Sequence[int],
    spec,
    greenlist,
    eval_params: EvalParams,
    row_tags: Optional[Dict] = None,
) -> List[dict]:
    """Compute metrics for every (transform, param, sample) and save the
    reference-format result tree. Returns the flat list of metric records."""
    orig_codes = log["roundtrips"][0][1]
    orig_imgs = log["roundtrips"][0][2]
    records = []
    for transform, rows in log.items():
        for param, codes, imgs in rows:
            pvals = None
            if spec is not None and "pvalue" in eval_params.metric_names:
                pvals = np.asarray(detect(spec, greenlist, jnp.asarray(codes)))
            l0 = np.asarray(l0_token_mismatch(codes, orig_codes))
            extra = (row_tags or {}).get((transform, param), {})
            for i in range(codes.shape[0]):
                metrics = dict(extra)
                if pvals is not None:
                    metrics["pvalue"] = float(pvals[i])
                if "l0" in eval_params.metric_names:
                    metrics["l0"] = float(l0[i])
                if "psnr" in eval_params.metric_names:
                    metrics["psnr"] = psnr_pm1(imgs[i], orig_imgs[i])
                rec = {
                    "conditioning": conditionings[i],
                    "idx": cond_indices[i],
                    "method": method,
                    "transform": transform,
                    "param": param,
                    **metrics,
                }
                records.append(rec)
                if outdir and eval_params.orig_only:
                    # FID layout (``generate.py:96-109``): flat images/ and
                    # codes/ dirs, only the unattacked originals.
                    if transform == "roundtrips" and param == 0:
                        os.makedirs(os.path.join(outdir, "images"), exist_ok=True)
                        os.makedirs(os.path.join(outdir, "codes"), exist_ok=True)
                        stem = f"{conditionings[i]}:{cond_indices[i]:04}"
                        to_pillow(imgs[i]).save(os.path.join(outdir, "images", stem + ".png"))
                        np.save(os.path.join(outdir, "codes", stem + ".npy"), codes[i])
                elif outdir:
                    cdir = os.path.join(outdir, f"c={conditionings[i]},idx={cond_indices[i]}")
                    os.makedirs(cdir, exist_ok=True)
                    stem = f"{cond_indices[i]:04}_{method}_{transform}_{param}"
                    if eval_params.save_images:
                        to_pillow(imgs[i]).save(os.path.join(cdir, stem + ".png"))
                    np.save(os.path.join(cdir, stem + ".npy"), codes[i])
                    with open(os.path.join(cdir, stem + ".json"), "w") as f:
                        json.dump(metrics, f)
    return records


def generate_and_evaluate(
    outdir: str,
    wrapper,
    all_conditionings: Sequence[Any],
    gen_params,
    eval_params: EvalParams,
    aug_manager: Optional[AugmentationManager],
    batch_size: int,
    seed: int = 42,
    chunk_id: int = 0,
    num_chunks: int = 1,
    apply_watermark: bool = True,
    sync_manager=None,
    log_fn=print,
    mesh=None,
) -> List[dict]:
    """The reference's ``generate()`` driver (``generate.py:168-232``):
    batch striping for chunk parallelism, per-chunk seed offsets, per-batch
    sample -> log -> metrics -> save.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis — each
    batch's conditionings are sharded over it, so N chips generate (and
    attack/detect) N slices of the batch concurrently. Token-identical to
    the single-device run (``tests/test_parallel.py``); integer
    conditionings only (Chameleon prompt batches stay chunk-parallel).
    """
    import contextlib

    batches = [
        all_conditionings[i : i + batch_size] for i in range(0, len(all_conditionings), batch_size)
    ]
    method = str(wrapper.watermark_spec) if (apply_watermark and wrapper.watermark_spec) else "none"
    base_rng = jax.random.PRNGKey(seed + 1000 * chunk_id)

    counts: Dict[Any, int] = {}
    records = []
    for bi, batch in enumerate(batches):
        cond_indices = []
        for c in batch:
            counts[c] = counts.get(c, 0) + 1
            cond_indices.append(counts[c])
        if bi % num_chunks != chunk_id:
            continue
        rng = jax.random.fold_in(base_rng, bi)
        t0 = time.time()
        with jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext():
            codes = _sample_maybe_sharded(
                wrapper, batch, gen_params, apply_watermark, rng, mesh)
            codes.block_until_ready()
            log_fn(f"batch {bi}: sampling took {time.time() - t0:.2f}s")
            log = fill_batch_log(
                wrapper, codes, aug_manager, eval_params, jax.random.fold_in(rng, 999), sync_manager
            )
            records += compute_and_save_batch(
                log,
                outdir,
                method,
                list(batch),
                cond_indices,
                wrapper.watermark_spec,
                wrapper.greenlist,
                eval_params,
                row_tags=getattr(aug_manager, "row_tags", None),
            )
    return records


def _sample_maybe_sharded(wrapper, batch, gen_params, apply_watermark, rng, mesh):
    """Sample one batch, sharding the conditionings over the mesh's dp axis.

    Rows are padded (by repeating the last conditioning) to a multiple of the
    dp size so every device gets equal work, then trimmed — the sample scan
    is row-independent, so padding changes nothing for the real rows."""
    if mesh is None or mesh.shape.get("dp", 1) == 1:
        # tp-only mesh: params are sharded; inputs stay replicated
        return wrapper.sample(list(batch), gen_params, apply_watermark=apply_watermark, rng=rng)
    if not all(isinstance(c, (int, np.integer)) for c in batch):
        raise ValueError("--dp sharding requires integer (class) conditionings")
    from wmar_tpu.parallel import shard_batch

    dp = mesh.shape["dp"]
    n = len(batch)
    ids = list(batch) + [batch[-1]] * ((-n) % dp)
    sharded = shard_batch(mesh, jnp.asarray(ids, jnp.int32))
    codes = wrapper.sample(sharded, gen_params, apply_watermark=apply_watermark, rng=rng)
    return codes[:n]
