"""Probe the in-kernel throughput of the SELLW gather primitives.

The round-1 probe measured one-op-per-pallas-call (~15 G elem/s including
dispatch); this one puts a fori_loop of K dependent ops INSIDE one kernel so
we see the intrinsic op rate that a fused SpMV kernel would pay.

Primitives probed (all on VMEM-resident data):
  1. take_along_axis(axis=1) on (S,128) f32  — per-sublane 128-lane shuffle
  2. take_along_axis(axis=0) on (8,128) f32  — sublane pick within a vreg
  3. dynamic sublane slice  table[pl.ds(i,8), :]  from a (R,128) table
  4. pltpu.roll lane roll (baseline: known ~1 vreg-op/cycle)

Run:  python tools/probe_shuffle.py
"""

import sys, time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from spmv_research_tpu.utils.timing import measure_op  # noqa: E402


def _pcall(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(*args)


def probe_axis1(S=256, K=512):
    def kernel(v_ref, idx_ref, o_ref):
        def body(_, v):
            g = jnp.take_along_axis(v, idx_ref[:], axis=1)
            return v + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (S, 128)), jnp.int32)
    fn = lambda v, idx: _pcall(kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), v, idx)
    t = measure_op(fn, v, idx)
    per_op = t / K
    print(f"axis1 shuffle (S={S}): {per_op*1e9:.1f} ns/op "
          f"{S*128/per_op/1e9:.1f} G elem/s", flush=True)
    return S * 128 / per_op


def probe_axis0(K=512, S=256):
    """S/8 independent (8,128) tables, axis-0 pick in each (realistic: one
    window per chunk resident, sublane pick)."""
    def kernel(v_ref, idx_ref, o_ref):
        def body(_, v):
            g = jnp.take_along_axis(v, idx_ref[:], axis=0)
            return v + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(8, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 8, (8, 128)), jnp.int32)
    fn = lambda v, idx: _pcall(kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), v, idx)
    t = measure_op(fn, v, idx)
    per_op = t / K
    print(f"axis0 shuffle (8,128): {per_op*1e9:.1f} ns/op "
          f"{8*128/per_op/1e9:.1f} G elem/s", flush=True)
    return 8 * 128 / per_op


def probe_slice(R=1344, K=512):
    def kernel(tab_ref, iv_ref, o_ref):
        def body(j, acc):
            i = iv_ref[j % 128]
            w = tab_ref[pl.ds(i, 8), :]
            return acc + w * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((8, 128), jnp.float32))

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.uniform(size=(R, 128)), jnp.float32)
    iv = jnp.asarray(rng.integers(0, R - 8, (128,)), jnp.int32)

    def fn(tab, iv):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(tab, iv)

    t = measure_op(fn, tab, iv)
    per_op = t / K
    print(f"dyn sublane slice (8,128) from ({R},128): {per_op*1e9:.1f} ns/op",
          flush=True)
    return per_op


def probe_roll(S=256, K=512):
    def kernel(v_ref, o_ref):
        def body(_, v):
            return v + pltpu.roll(v, 1, 1) * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    fn = lambda v: _pcall(kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), v)
    t = measure_op(fn, v)
    per_op = t / K
    print(f"lane roll (S={S}): {per_op*1e9:.1f} ns/op "
          f"{S*128/per_op/1e9:.1f} G elem/s", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    probe_roll()
    probe_roll(S=8)
    probe_axis1()
    probe_axis1(S=8)
    probe_axis0()
    probe_slice()
