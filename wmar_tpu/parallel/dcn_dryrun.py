"""Two-process DCN dryrun: a real cross-process data-parallel train step.

The reference trains multi-node via DDP over NCCL with SLURM/torchrun
rendezvous (``wmar/utils/distributed.py:88-228``). The TPU equivalent is
multi-controller JAX: every host calls :func:`wmar_tpu.parallel.mesh.
init_multihost` (→ ``jax.distributed.initialize``), builds ONE global mesh
over all hosts' devices, and XLA inserts the gradient all-reduce across DCN.

This module proves that path without a pod: the parent spawns ``n_procs``
local CPU processes with torchrun-style rendezvous env (exercising
``parse_distributed_env``), and each child runs one RCC training step over
a global ``dp`` mesh spanning both processes — the per-process batch shards
enter via ``jax.make_array_from_process_local_data`` and the loss/grad
reduction crosses the process boundary. The parent asserts both ranks
report the same loss (the all-reduce actually happened).

Wired into ``__graft_entry__.dryrun_multichip`` as its final stage.
"""

from __future__ import annotations

import os
import subprocess
import sys

# Everything the child needs, inline: it must call jax.distributed.initialize
# before ANY backend-touching jax call, so it cannot reuse a parent that has
# already bound devices.
_CHILD = r"""
import os
import jax
jax.config.update("jax_platforms", "cpu")

from wmar_tpu.parallel.mesh import init_multihost

init_multihost()  # parses RANK/WORLD_SIZE/MASTER_ADDR (torchrun-style)
world = int(os.environ["WORLD_SIZE"])
assert jax.process_count() == world, (
    f"process_count={jax.process_count()}, want {world}")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wmar_tpu.finetune import (
    RCCConfig, TamingRCCAdapter, init_state, make_optimizer, make_train_step,
)
from wmar_tpu.models import TamingVQGAN, VQGANConfig

vq_cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), z_channels=32, n_embed=64,
                     embed_dim=16)
model = TamingVQGAN(vq_cfg)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
adapter = TamingRCCAdapter(model, variables)
cfg = RCCConfig(lr=1e-4)
opt = make_optimizer(cfg)
state = init_state(adapter, opt)

mesh = Mesh(np.array(jax.devices()), ("dp",))
n_global = len(jax.devices())
n_local = len(jax.local_devices())
# identical global batch on every rank (seeded), each process feeding its
# local shard — the multi-host data pipeline contract
rng = np.random.default_rng(0)
codes_global = rng.integers(0, 64, size=(n_global, vq_cfg.codes_per_side ** 2))
lo = jax.process_index() * n_local
codes_local = codes_global[lo:lo + n_local]

batch = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), np.asarray(codes_local))
with jax.set_mesh(mesh):
    state = jax.device_put(state, NamedSharding(mesh, P()))
    train_step = jax.jit(make_train_step(adapter, cfg, "weak", opt))
    state, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(metrics)
loss = float(metrics["loss"])
print(f"DCN_RANK={jax.process_index()} procs={jax.process_count()} "
      f"global_dev={n_global} loss={loss:.6f}", flush=True)
"""


# Cross-process TENSOR parallelism: the reference's Chameleon TP runs its
# sharded matmul collectives across ranks (deps/chameleon/inference/
# transformer.py:159,220 — dist.all_reduce inside every layer, workers
# spawned per rank in chameleon.py:499-565). This child builds a (dp, tp)
# mesh whose TP axis SPANS the two processes (device matrix transposed so
# tp pairs are [p0d_i, p1d_i]), shards a tiny Llama with the megatron
# specs, and runs prefill + one decode step on the packed int8 KV cache —
# the per-layer all-reduces and the packed kernel's shard_map dispatch all
# cross the process boundary. Each rank also recomputes the UNSHARDED
# replicated-float reference logits locally and asserts equivalence, then
# prints a checksum the parent compares across ranks.
_CHILD_TP = r"""
import os
import jax
jax.config.update("jax_platforms", "cpu")

from wmar_tpu.parallel.mesh import init_multihost

init_multihost()
world = int(os.environ["WORLD_SIZE"])
assert jax.process_count() == world

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wmar_tpu.engine.kvcache import KVCache
from wmar_tpu.models.llama import (
    LlamaConfig, init_llama_params, llama_forward, llama_tp_specs,
)
from wmar_tpu.parallel.mesh import apply_specs

n_local = len(jax.local_devices())
devs = np.array(jax.devices()).reshape(world, n_local).T  # tp axis spans procs
mesh = Mesh(devs, ("dp", "tp"))
tp = world  # == devs.shape[1]
dp = n_local

cfg = LlamaConfig(dim=16 * tp, n_layers=2, n_heads=2 * tp, vocab_size=64,
                  multiple_of=32, qk_normalization=True)
params = init_llama_params(jax.random.PRNGKey(4), cfg)
b = 2 * dp
tok = jnp.asarray(np.random.default_rng(3).integers(0, 64, size=(b, 4)), jnp.int32)
pos = jnp.broadcast_to(jnp.arange(4)[None], (b, 4))
nxt = jnp.asarray(np.random.default_rng(5).integers(0, 64, size=(b, 1)), jnp.int32)

with jax.set_mesh(mesh):
    sparams = apply_specs(mesh, params, llama_tp_specs(params))
    cache = KVCache.zeros(cfg.n_layers, b, cfg.n_heads, 16, cfg.head_dim,
                          "packed", mesh=mesh, dp_axis="dp", tp_axis="tp")
    _, cache = jax.jit(
        lambda p, t, c: llama_forward(p, cfg, t, c, 0, pos))(sparams, tok, cache)
    logits, _ = jax.jit(
        lambda p, t, c: llama_forward(
            p, cfg, t, c, 4, jnp.full((b, 1), 4, jnp.int32)))(sparams, nxt, cache)
    jax.block_until_ready(logits)
    # replicate so every process holds the full logits (np.asarray needs a
    # fully-replicated multihost array)
    logits_g = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(logits)
    logits_np = np.asarray(logits_g)

# unsharded single-process reference on this rank's own devices
ref_cache = KVCache.zeros(cfg.n_layers, b, cfg.n_heads, 16, cfg.head_dim)
_, ref_cache = jax.jit(
    lambda p, t, c: llama_forward(p, cfg, t, c, 0, pos))(params, tok, ref_cache)
ref_logits, _ = jax.jit(
    lambda p, t, c: llama_forward(
        p, cfg, t, c, 4, jnp.full((b, 1), 4, jnp.int32)))(params, nxt, ref_cache)
err = float(np.abs(logits_np - np.asarray(ref_logits)).max())
assert err < 5e-2, f"TP logits diverge from replicated reference: {err}"
checksum = float(np.abs(logits_np).sum())
print(f"DCN_TP_RANK={jax.process_index()} tp={tp} dp={dp} err={err:.5f} "
      f"checksum={checksum:.6f}", flush=True)
"""


def _spawn(child_src: str, n_procs: int, local_devices: int, port: int,
           timeout: float, tag: str):
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = []
    for rank in range(n_procs):
        env = {
            "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
            "HOME": os.environ.get("HOME", "/root"),
            "PYTHONPATH": repo,
            "JAX_PLATFORMS": "cpu",
            "WMAR_NO_JAX_CACHE": "1",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={local_devices}",
            # torchrun-style rendezvous: what parse_distributed_env reads
            "RANK": str(rank),
            "WORLD_SIZE": str(n_procs),
            "MASTER_ADDR": "127.0.0.1",
            "MASTER_PORT": str(port),
        }
        procs.append(subprocess.Popen(
            [sys.executable, "-c", child_src], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    reports = {}
    errs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            errs.append(f"rank {rank}: timeout after {timeout:.0f}s\n{err[-2000:]}")
            continue
        if p.returncode != 0:
            errs.append(f"rank {rank}: rc={p.returncode}\n{err[-2000:]}")
            continue
        for line in out.splitlines():
            if line.startswith(tag):
                reports[rank] = line
    if errs:
        raise RuntimeError(f"{tag} dryrun failed:\n" + "\n".join(errs))
    if sorted(reports) != list(range(n_procs)):
        raise RuntimeError(f"{tag} dryrun: missing rank reports, got {reports}")
    return reports


def run_dcn_dryrun(n_procs: int = 2, local_devices: int = 2,
                   port: int = 23911, timeout: float = 600.0) -> float:
    """Spawn ``n_procs`` local CPU processes and run one cross-process DP
    train step. Returns the (rank-agreed) loss; raises on any failure."""
    reports = _spawn(_CHILD, n_procs, local_devices, port, timeout, "DCN_RANK=")
    losses = {r: float(line.rsplit("loss=", 1)[1])
              for r, line in reports.items()}
    vals = list(losses.values())
    if max(vals) - min(vals) > 1e-6:
        raise RuntimeError(f"DCN dryrun: ranks disagree on loss: {losses} "
                           "(cross-process all-reduce broken)")
    return vals[0]


def run_dcn_tp_dryrun(n_procs: int = 2, local_devices: int = 2,
                      port: int = 23913, timeout: float = 600.0) -> float:
    """Cross-process TENSOR-parallel decode step (TP axis spanning the two
    processes, packed int8 KV cache on the shard_map kernel path) with
    per-rank logits equivalence vs the replicated float reference. Returns
    the max |logits - reference| error; raises on any failure or on
    cross-rank checksum disagreement."""
    reports = _spawn(_CHILD_TP, n_procs, local_devices, port, timeout,
                     "DCN_TP_RANK=")
    sums = {r: line.rsplit("checksum=", 1)[1] for r, line in reports.items()}
    if len(set(sums.values())) != 1:
        raise RuntimeError(
            f"DCN TP dryrun: ranks disagree on logits checksum: {sums}")
    errs = {r: float(line.rsplit("err=", 1)[1].split()[0])
            for r, line in reports.items()}
    return max(errs.values())


if __name__ == "__main__":
    loss = run_dcn_dryrun()
    print(f"dcn dryrun ok: loss={loss:.6f}")
    err = run_dcn_tp_dryrun()
    print(f"dcn tp dryrun ok: max err={err:.5f}")
