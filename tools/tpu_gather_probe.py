"""Probe tpu.dynamic_gather (take_along_axis) shapes and throughput in Pallas."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spmv_research_tpu.utils.timing import measure_op

rng = np.random.default_rng(0)


def probe(shape, axis, reps=3):
    S = shape[axis]
    x = jnp.asarray(rng.uniform(size=shape), jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, shape), jnp.int32)

    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    @jax.jit
    def f(xa, ia):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xa, ia)

    try:
        r = np.asarray(jax.block_until_ready(f(x, idx)))
    except Exception as e:
        print(f"shape={shape} axis={axis}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
    ok = np.allclose(r, ref)
    # throughput: chain with dependency (idx reused; fold output into x)
    t = measure_op(lambda xa, ia: f(xa, ia), x, idx, k_lo=2, k_hi=34, reps=reps)
    cnt = int(np.prod(shape))
    print(f"shape={shape} axis={axis}: correct={ok} t={t*1e6:.1f}us  {cnt/t/1e9:.1f} G elem/s")


for axis in (0, 1):
    for shape in [(8, 128), (64, 128), (512, 128), (2048, 128), (8192, 128),
                  (8, 512), (8, 4096), (64, 1024), (256, 2048), (1024, 1024)]:
        probe(shape, axis)
