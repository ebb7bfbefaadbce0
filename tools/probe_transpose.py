"""Probe transpose + in-vreg permutation building blocks for the CLOS router.

  1. jnp.transpose (1024,1024) f32 inside a pallas kernel
  2. jnp.transpose at XLA level (outside pallas)
  3. per-vreg axis0 sublane-pick loop over 128 chunks (fallback batching)
  4. within-8 sublane rotation via 2 rolls + select on (S,128) (batched alt)
  5. reshape-pick strided subsample v.reshape(S,32,4)[:,:,3]

Run:  python tools/probe_transpose.py
"""

import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from spmv_research_tpu.utils.timing import measure_op  # noqa: E402


def _pcall(kernel, out_shape, args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )(*args)


def probe_transpose_pallas(D=1024, K=64):
    def kernel(v_ref, o_ref):
        def body(_, v):
            t = jnp.transpose(v)
            return v + t * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(D, D)), jnp.float32)
    try:
        fn = lambda v: _pcall(kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), (v,))
        t = measure_op(fn, v, k_lo=2, k_hi=10) / K
        print(f"pallas transpose ({D},{D}): {t*1e6:.2f} us "
              f"({D*D*4/t/1e9:.0f} GB/s eq)", flush=True)
    except Exception as e:
        print(f"pallas transpose: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def probe_transpose_xla(D=1024):
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(D, D)), jnp.float32)
    fn = lambda v: jnp.transpose(v) + 0.0
    t = measure_op(fn, v)
    print(f"XLA transpose ({D},{D}): {t*1e6:.2f} us ({D*D*4/t/1e9:.0f} GB/s eq)",
          flush=True)


def probe_axis0_loop(NC=128, K=8):
    """Per-chunk sublane pick over a (NC*8,128) array via fori_loop."""
    S = NC * 8

    def kernel(v_ref, idx_ref, o_ref):
        def rep(_, acc):
            def body(c, z):
                blk = v_ref[pl.ds(8 * c, 8), :]
                ix = idx_ref[pl.ds(8 * c, 8), :]
                o_ref[pl.ds(8 * c, 8), :] = jnp.take_along_axis(blk, ix, axis=0)
                return z
            jax.lax.fori_loop(0, NC, body, 0)
            return acc
        jax.lax.fori_loop(0, K, rep, 0)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 8, (S, 128)), jnp.int32)
    fn = lambda v, idx: _pcall(kernel, jax.ShapeDtypeStruct(v.shape, v.dtype),
                               (v, idx))
    t = measure_op(fn, v, idx, k_lo=2, k_hi=10) / K
    print(f"axis0 pick loop (NC={NC}): {t/NC*1e9:.1f} ns/vreg "
          f"{S*128/t/1e9:.1f} G elem/s", flush=True)


def probe_subrot(S=1024, K=64):
    """Batched within-8 sublane-pick built from rolls + selects."""
    def kernel(v_ref, b_ref, o_ref):
        s_in_blk = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) % 8

        def body(_, v):
            b = b_ref[:]
            acc = v
            for r in range(1, 8):
                lo = pltpu.roll(v, S - r, 0)
                hi = pltpu.roll(v, S - r + 8, 0)
                rot = jnp.where(s_in_blk < 8 - r, lo, hi)
                acc = jnp.where(b == r, rot, acc)
            return v + acc * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    b = jnp.asarray(rng.integers(0, 8, (S, 128)), jnp.int32)
    fn = lambda v, b: _pcall(kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), (v, b))
    t = measure_op(fn, v, b, k_lo=2, k_hi=10) / K
    print(f"subrot pick (S={S}): {t*1e9:.1f} ns {S*128/t/1e9:.1f} G elem/s",
          flush=True)


def probe_reshape_pick(S=1024, w=4, K=256):
    def kernel(v_ref, o_ref):
        def body(_, acc):
            g = v_ref[:].reshape(S, 128 // w, w)[:, :, w - 1]
            return acc + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body,
                                     jnp.zeros((S, 128 // w), jnp.float32))

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    try:
        fn = lambda v: _pcall(kernel,
                              jax.ShapeDtypeStruct((S, 128 // w), jnp.float32),
                              (v,))
        t = measure_op(fn, v) / K
        print(f"reshape-pick [:,:, {w-1}] (S={S}): {t*1e9:.1f} ns/op", flush=True)
    except Exception as e:
        print(f"reshape-pick: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    probe_transpose_xla()
    probe_transpose_pallas()
    probe_axis0_loop()
    probe_subrot()
    probe_reshape_pick()
