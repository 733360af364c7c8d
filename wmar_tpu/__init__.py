"""wmar_tpu: TPU-native watermarking for autoregressive multimodal generation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/wmar (NeurIPS 2025, arXiv:2506.16349):

- generation-time red/green-list watermarking fused into `lax.scan`
  autoregressive decoding (`wmar_tpu.engine`),
- on-device detection via re-tokenization + greenlist scoring
  (`wmar_tpu.core.detect`),
- VQGAN tokenizers as XLA conv stacks with RCC finetuning
  (`wmar_tpu.models`, `wmar_tpu.finetune`),
- jittable robustness augmentations (`wmar_tpu.augmentations`),
- mesh/sharding-based parallelism in place of DDP/NCCL
  (`wmar_tpu.parallel`).
"""

__version__ = "0.1.0"
