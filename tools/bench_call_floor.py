import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wmar_tpu.utils import tagged_cache_dir
jax.config.update("jax_compilation_cache_dir", tagged_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STEPS = 64

def make_copy(rows):
    """Trivial kernel: read [rows, 1024] bf16, write column means [rows, 128]."""
    def kern(x_ref, o_ref):
        o_ref[...] = jnp.mean(x_ref[...], axis=1, keepdims=True) * jnp.ones((1, 128), jnp.bfloat16)
    def call(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x)
    return call

def bench(name, rows):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((rows, 1024)), jnp.bfloat16)
    f = make_copy(rows)
    def body(acc, i):
        o = f(x * acc)
        return acc + o[0, 0] * 0, ()
    def run(a0):
        out, _ = jax.lax.scan(body, a0, jnp.arange(STEPS))
        return out
    g = jax.jit(run)
    jax.block_until_ready(g(jnp.bfloat16(1.0)))
    t0 = time.time(); jax.block_until_ready(g(jnp.bfloat16(1.0))); dt = (time.time() - t0) / STEPS
    mb = rows * 1024 * 2 / 1e6
    print(f"  rows={rows:6d} ({mb:8.2f} MB)  {dt*1e6:9.1f} us/call  {mb/1e3/dt:7.1f} GB/s", flush=True)

# scan-only baseline: no pallas at all
def bench_noop():
    def body(acc, i):
        return acc * jnp.bfloat16(1.0000001), ()
    def run(a0):
        out, _ = jax.lax.scan(body, a0, jnp.arange(STEPS))
        return out
    g = jax.jit(run)
    jax.block_until_ready(g(jnp.bfloat16(1.0)))
    t0 = time.time(); jax.block_until_ready(g(jnp.bfloat16(1.0))); dt = (time.time() - t0) / STEPS
    print(f"  scan-noop           {dt*1e6:9.1f} us/iter", flush=True)

bench_noop()
for rows in (1, 64, 1024, 4096, 16384):
    bench("copy", rows)
