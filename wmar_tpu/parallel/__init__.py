"""Device-mesh parallelism (dp/tp) over ICI — the SPMD replacement for the
reference's DDP + NCCL tensor-parallel worker pool."""

from wmar_tpu.parallel.ring import ring_prefill_attention
from wmar_tpu.parallel.mesh import (
    apply_specs,
    batch_sharding,
    gpt_tp_specs,
    init_multihost,
    kvcache_tp_spec,
    kvcache_tp_specs,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "apply_specs",
    "batch_sharding",
    "gpt_tp_specs",
    "init_multihost",
    "kvcache_tp_spec",
    "kvcache_tp_specs",
    "make_mesh",
    "replicate",
    "replicated",
    "ring_prefill_attention",
    "shard_batch",
]
