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


def run_dcn_dryrun(n_procs: int = 2, local_devices: int = 2,
                   port: int = 23911, timeout: float = 600.0) -> float:
    """Spawn ``n_procs`` local CPU processes and run one cross-process DP
    train step. Returns the (rank-agreed) loss; raises on any failure."""
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
            [sys.executable, "-c", _CHILD], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    losses = {}
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
            if line.startswith("DCN_RANK="):
                losses[rank] = float(line.rsplit("loss=", 1)[1])
    if errs:
        raise RuntimeError("DCN dryrun failed:\n" + "\n".join(errs))
    if sorted(losses) != list(range(n_procs)):
        raise RuntimeError(f"DCN dryrun: missing rank reports, got {losses}")
    vals = list(losses.values())
    if max(vals) - min(vals) > 1e-6:
        raise RuntimeError(f"DCN dryrun: ranks disagree on loss: {losses} "
                           "(cross-process all-reduce broken)")
    return vals[0]


if __name__ == "__main__":
    loss = run_dcn_dryrun()
    print(f"dcn dryrun ok: loss={loss:.6f}")
