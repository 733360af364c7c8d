"""Device-mesh parallelism (dp/tp) over ICI — the SPMD replacement for the
reference's DDP + NCCL tensor-parallel worker pool."""

from wmar_tpu.parallel.pipeline import llama_prefill_pp, stack_blocks
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
    "llama_prefill_pp",
    "make_mesh",
    "replicate",
    "replicated",
    "ring_prefill_attention",
    "shard_batch",
    "stack_blocks",
]
