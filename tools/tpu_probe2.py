"""Second probe round: primitives for the routing-network SpMV kernel.

Measures inside real pallas kernels (grid=1, all VMEM):
  1. roll+select chain throughput (butterfly stage cost)
  2. lane-shuffle (axis-1 dynamic_gather) in a tight chain
  3. dynamic sublane slice reads in a fori_loop (scalar-gather rate)
  4. cumulative-scan building block (log-shift adds)
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spmv_research_tpu.utils.timing import measure_op

rng = np.random.default_rng(0)
S, L = 4096, 128          # 512k f32 = 2MB working array
N = S * L


def pcall(kern, out_shape, n_in, scratch=None):
    return lambda *a: pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch or [],
    )(*a)


# 1. butterfly-stage chain: 32 stages of roll+select on (S,128)
def bfly_kern(x_ref, m_ref, o_ref):
    v = x_ref[:]
    for k in range(32):
        d = 1 << (k % 7)
        axis = 1 if (k % 2 == 0) else 0
        partner = pltpu.roll(v, d, axis)
        v = jnp.where(m_ref[:] > k, partner, v) + jnp.where(m_ref[:] == k, partner, 0.0)
    o_ref[:] = v

x = jnp.asarray(rng.uniform(size=(S, L)), jnp.float32)
mk = jnp.asarray(rng.integers(0, 64, (S, L)), jnp.int32)
f1 = jax.jit(pcall(bfly_kern, jax.ShapeDtypeStruct((S, L), jnp.float32), 2))
t = measure_op(lambda a, b: f1(a, b), x, mk, k_lo=2, k_hi=10, reps=3)
print(f"butterfly 32 stages on {N} slots: {t*1e6:.1f}us -> {32*N/t/1e9:.1f} G stage-elem/s")

# 2. lane-shuffle chain: 16 shuffles on (S,128)
def shuf_kern(x_ref, i_ref, o_ref):
    v = x_ref[:]
    idx = i_ref[:]
    for k in range(16):
        v = jnp.take_along_axis(v, idx, axis=1)
    o_ref[:] = v

ii = jnp.asarray(rng.integers(0, L, (S, L)), jnp.int32)
f2 = jax.jit(pcall(shuf_kern, jax.ShapeDtypeStruct((S, L), jnp.float32), 2))
t = measure_op(lambda a, b: f2(a, b), x, ii, k_lo=2, k_hi=10, reps=3)
print(f"lane-shuffle x16 on {N}: {t*1e6:.1f}us -> {16*N/t/1e9:.1f} G shuf-elem/s")

# 2b. sublane shuffle (axis=0, 8-deep) on (8, 65536)
def shuf0_kern(x_ref, i_ref, o_ref):
    v = x_ref[:]
    idx = i_ref[:]
    for k in range(16):
        v = jnp.take_along_axis(v, idx, axis=0)
    o_ref[:] = v

x8 = jnp.asarray(rng.uniform(size=(8, 65536)), jnp.float32)
i8 = jnp.asarray(rng.integers(0, 8, (8, 65536)), jnp.int32)
f2b = jax.jit(pcall(shuf0_kern, jax.ShapeDtypeStruct((8, 65536), jnp.float32), 2))
t = measure_op(lambda a, b: f2b(a, b), x8, i8, k_lo=2, k_hi=10, reps=3)
print(f"sublane-shuffle x16 on 512k: {t*1e6:.1f}us -> {16*8*65536/t/1e9:.1f} G shuf-elem/s")

# 3. dynamic sublane reads in fori_loop: 4096 reads of (1,128) rows
def dynread_kern(x_ref, q_ref, o_ref):
    def body(i, acc):
        q = q_ref[i, 0]
        row = x_ref[pl.ds(q, 1), :]
        return acc + row
    acc = jax.lax.fori_loop(0, 4096, body, jnp.zeros((1, 128), jnp.float32))
    o_ref[:] = acc

qq = jnp.asarray(rng.integers(0, S, (4096, 1)), jnp.int32)
f3 = jax.jit(pcall(dynread_kern, jax.ShapeDtypeStruct((1, 128), jnp.float32), 2))
t = measure_op(lambda a, b: f3(a, b), x, qq, k_lo=2, k_hi=10, reps=3)
print(f"dyn sublane reads: 4096 reads in {t*1e6:.1f}us -> {4096/t/1e6:.2f} M rows/s = {4096*128/t/1e9:.1f} G elem/s")

# 4. log-scan: 12 stages of roll+add along sublanes
def scan_kern(x_ref, o_ref):
    v = x_ref[:]
    for k in range(12):
        v = v + pltpu.roll(v, 1 << k, 0)
    o_ref[:] = v

f4 = jax.jit(pcall(scan_kern, jax.ShapeDtypeStruct((S, L), jnp.float32), 1))
t = measure_op(lambda a: f4(a), x, k_lo=2, k_hi=10, reps=3)
print(f"log-scan 12 stages: {t*1e6:.1f}us -> {12*N/t/1e9:.1f} G stage-elem/s")

# 5. MXU one-hot-style f32 matmul (for segmented reduce alternatives)
def mm_kern(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

A = jnp.asarray(rng.uniform(size=(1024, 1024)), jnp.float32)
B = jnp.asarray(rng.uniform(size=(1024, 1024)), jnp.float32)
f5 = jax.jit(pcall(mm_kern, jax.ShapeDtypeStruct((1024, 1024), jnp.float32), 2))
t = measure_op(lambda a, b: f5(a, b), A, B, k_lo=2, k_hi=10, reps=3)
print(f"f32 1024^3 matmul in-kernel: {t*1e6:.1f}us -> {2*1024**3/t/1e12:.1f} TFLOPs")
