"""Data-parallel generation over a device mesh (multi-chip serving path)."""

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.core import WatermarkSpec
from wmar_tpu.core.spec import SeedStrategy, SplitStrategy
from wmar_tpu.models import GenParams, MaskGitVQConfig, MaskGitVQGAN, RARConfig, RarARMM, init_rar_params
from wmar_tpu.parallel import make_mesh, shard_batch


def test_dp_sharded_generation_matches_single_device():
    """class_ids sharded over an 8-way dp mesh produce the same codes."""
    rar_cfg = RARConfig(embed_dim=32, depth=2, num_heads=2, intermediate_size=64,
                        image_seq_len=16, codebook_size=64, num_classes=10)
    vq_cfg = MaskGitVQConfig(resolution=8, hidden_channels=32, channel_mult=(1, 2),
                             num_res_blocks=1, z_channels=16, n_embed=64, embed_dim=16)
    params = init_rar_params(jax.random.PRNGKey(0), rar_cfg)
    vq = MaskGitVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    wrapper = RarARMM(params, rar_cfg, vq_params, vq_cfg, cache_dtype=jnp.float32)
    spec = WatermarkSpec(vocab_size=64, seed_strategy=SeedStrategy.LINEAR,
                         split_strategy=SplitStrategy.RANDOM, context_size=1,
                         delta=4.0, gamma=0.25)
    wrapper.set_watermarker(spec)
    gen = GenParams(temperature=1.0, guidance_scale=4.0)
    classes = np.arange(8)

    ref = wrapper.sample(classes, gen, True, jax.random.PRNGKey(0))

    mesh = make_mesh(dp=8, tp=1)
    with jax.set_mesh(mesh):
        sharded = shard_batch(mesh, jnp.asarray(classes, jnp.int32))
        out = wrapper.sample(sharded, gen, True, jax.random.PRNGKey(0))
        imgs = wrapper.codes_to_images(out)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert imgs.shape == (8, 8, 8, 3)


def test_parse_distributed_env():
    """Optional SLURM/torchrun rendezvous parsing (the reference's
    init_distributed_mode env handling, distributed.py:88-228)."""
    from wmar_tpu.parallel.mesh import parse_distributed_env

    assert parse_distributed_env({}) == {}
    slurm = parse_distributed_env({
        "SLURM_PROCID": "3", "SLURM_NTASKS": "16",
        "MASTER_ADDR": "10.0.0.1", "MASTER_PORT": "29500",
    })
    assert slurm == {"process_id": 3, "num_processes": 16,
                     "coordinator_address": "10.0.0.1:29500"}
    # SLURM without MASTER_ADDR falls back to the launch node ip
    slurm2 = parse_distributed_env({
        "SLURM_PROCID": "0", "SLURM_NTASKS": "2",
        "SLURM_LAUNCH_NODE_IPADDR": "10.0.0.9",
    })
    assert slurm2["coordinator_address"] == "10.0.0.9:12355"
    torchrun = parse_distributed_env({
        "RANK": "1", "WORLD_SIZE": "8", "MASTER_ADDR": "h0",
    })
    assert torchrun == {"process_id": 1, "num_processes": 8,
                        "coordinator_address": "h0:12355"}


def test_quant_kvcache_tp_sharding():
    """The int8 cache (payload + per-token scales) shards over heads on the
    tp axis and decode-attends correctly through the mesh."""
    import jax.numpy as jnp

    from wmar_tpu.engine.attention import decode_attention
    from wmar_tpu.engine.kvcache import KVCache
    from wmar_tpu.parallel import apply_specs, kvcache_tp_specs, make_mesh

    mesh = make_mesh(dp=4, tp=2)
    rng = np.random.default_rng(0)
    cq = KVCache.zeros(1, 2, 4, 8, 16, dtype=jnp.int8)
    cq = cq.write(0, 0, jnp.asarray(rng.standard_normal((2, 4, 3, 16)), jnp.float32),
                  jnp.asarray(rng.standard_normal((2, 4, 3, 16)), jnp.float32))
    q = jnp.asarray(rng.standard_normal((2, 4, 1, 16)), jnp.float32)
    ref = decode_attention(q, *cq.layer(0), jnp.int32(3))
    with jax.set_mesh(mesh):
        sharded = apply_specs(mesh, cq, kvcache_tp_specs(cq))
        out = jax.jit(lambda c, qq: decode_attention(qq, *c.layer(0), jnp.int32(3)))(sharded, q)
    # bf16 dequant: sharded/replicated reduction orders differ slightly
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
