"""Mesh + sharding helpers: the TPU replacement for DDP/NCCL worker pools.

The reference reaches NCCL three ways (SURVEY §2.10): DDP gradient
all-reduce (``finetune.py:313-318``), Chameleon tensor-parallel collectives
(``deps/chameleon/inference/transformer.py:159,220``), and SLURM/torchrun
rendezvous (``wmar/utils/distributed.py:88-228``). Under SPMD all three
collapse to: build a `Mesh`, annotate shardings, and let XLA insert
collectives over ICI.

Conventions: axis ``dp`` shards the batch (data parallel), axis ``tp``
shards attention heads / MLP hidden / vocab (megatron-style tensor
parallel).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1, pp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, tp[, sp][, pp]) mesh over the available devices.

    ``sp`` is the sequence-parallel axis for ring-attention prefill
    (:mod:`wmar_tpu.parallel.ring`); ``pp`` the pipeline-stage axis
    (:mod:`wmar_tpu.parallel.pipeline`). Each extra axis is only added to
    the mesh when >1 so existing (dp, tp) callers see an unchanged
    two-axis mesh.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp * pp)
    assert dp * tp * sp * pp == n, \
        f"dp({dp}) * tp({tp}) * sp({sp}) * pp({pp}) != devices({n})"
    shape = [dp, tp]
    names = ["dp", "tp"]
    if sp > 1:
        shape.append(sp)
        names.append("sp")
    if pp > 1:
        shape.append(pp)
        names.append("pp")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] arrays with B sharded over ``dp``."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def parse_distributed_env(env=None) -> dict:
    """Optional SLURM / torchrun-style rendezvous parsing, mirroring the
    reference's ``init_distributed_mode`` env handling
    (``wmar/utils/distributed.py:88-228``) for non-pod launchers.

    Returns kwargs for ``jax.distributed.initialize``; empty when no
    recognized launcher env is present (the TPU pod runtime self-discovers).
    """
    import os as _os

    env = _os.environ if env is None else env
    out: dict = {}
    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        out["process_id"] = int(env["SLURM_PROCID"])
        out["num_processes"] = int(env["SLURM_NTASKS"])
        addr = env.get("MASTER_ADDR") or env.get("SLURM_LAUNCH_NODE_IPADDR")
        if addr:
            out["coordinator_address"] = f"{addr}:{env.get('MASTER_PORT', '12355')}"
    elif "RANK" in env and "WORLD_SIZE" in env:  # torchrun-style
        out["process_id"] = int(env["RANK"])
        out["num_processes"] = int(env["WORLD_SIZE"])
        if env.get("MASTER_ADDR"):
            out["coordinator_address"] = f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '12355')}"
    return out


def init_multihost(coordinator_address: Optional[str] = None):
    """Multi-host bring-up: `jax.distributed.initialize` discovers peers via
    the TPU pod runtime (the reference's ``init_distributed_mode``
    equivalent); SLURM/torchrun rendezvous env is honored when present."""
    # NOTE: must not call jax.process_count()/jax.devices() here — touching
    # the backend before jax.distributed.initialize makes initialization
    # impossible. Check the distributed client state directly.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    kwargs = parse_distributed_env()
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if kwargs.get("num_processes", 1) > 1 or coordinator_address is not None:
        # a launcher/rendezvous env IS present: failures must be loud — a
        # swallowed init here silently degrades an N-host job to N separate
        # single-host jobs (and jax.distributed.initialize must run before
        # ANY backend-touching jax call; this package imports are safe)
        jax.distributed.initialize(**kwargs)
        return
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        pass  # single-host, no rendezvous env: stay single-process


# ---------------------------------------------------------------------------
# Megatron-style TP specs for the transformer frontends
# ---------------------------------------------------------------------------


def gpt_tp_specs(params: dict) -> dict:
    """PartitionSpecs for ``taming_gpt`` params: column-shard QKV/fc over
    ``tp``, row-shard proj, shard the vocab head. XLA inserts the per-layer
    all-reduces the reference issues manually (``transformer.py:159,220``)."""

    def block_spec(_):
        return {
            "ln1": {"scale": P(), "bias": P()},
            "ln2": {"scale": P(), "bias": P()},
            "attn": {
                "q": {"w": P(None, "tp"), "b": P("tp")},
                "k": {"w": P(None, "tp"), "b": P("tp")},
                "v": {"w": P(None, "tp"), "b": P("tp")},
                "proj": {"w": P("tp", None), "b": P()},
            },
            "mlp": {
                "fc": {"w": P(None, "tp"), "b": P("tp")},
                "proj": {"w": P("tp", None), "b": P()},
            },
        }

    return {
        "tok_emb": P(),
        "pos_emb": P(),
        "blocks": [block_spec(b) for b in params["blocks"]],
        "ln_f": {"scale": P(), "bias": P()},
        "head": P(None, "tp"),
    }


def kvcache_tp_spec() -> P:
    """KV caches shard over heads (dim 2 of [L, B, H, T, D])."""
    return P(None, None, "tp", None, None)


def kvcache_tp_specs(cache):
    """Head-sharded PartitionSpec pytree matching ``cache`` — works for the
    float :class:`~wmar_tpu.engine.kvcache.KVCache`, the int8
    :class:`~wmar_tpu.engine.kvcache.QuantKVCache` (whose per-token scales
    are [L, B, H, T] and shard over the same head axis), and the packed
    layouts (built with ``tp_groups == tp``, whose grouped lane/scale-row
    axes shard directly)."""
    from wmar_tpu.engine.kvcache import (
        KVCache,
        Packed4QuantKVCache,
        PackedQuantKVCache,
        QuantKVCache,
    )

    p5 = P(None, None, "tp", None, None)
    if isinstance(cache, (PackedQuantKVCache, Packed4QuantKVCache)):
        return cache.replace(kv=P(None, None, None, "tp"),
                             scale=P(None, None, "tp", None))
    if isinstance(cache, QuantKVCache):
        p4 = P(None, None, "tp", None)
        return QuantKVCache(k=p5, v=p5, k_scale=p4, v_scale=p4)
    return KVCache(k=p5, v=p5)


def apply_specs(mesh: Mesh, tree, specs):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
