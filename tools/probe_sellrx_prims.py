#!/usr/bin/env python
"""Probe SELLRX primitive costs in-kernel (fori_loop of K dependent ops):

  1. take_along_axis(axis=0) on (S,128) with IN-VREG idx (base + u, u<8)
     — the W-window pick / placement pick. Does Mosaic lower it as a
     per-vreg sublane shuffle, and at what rate?
  2. same via explicit per-8-row-block loop (fallback shape)
  3. oct-masked accumulate: for o in 8: acc[o*8:+8] += where(oct==o, R8, 0)
     per (8,128) chunk plane (the SELLRX acc inner body)
  4. lane pick axis=1 baseline on the same S

Run: python tools/probe_sellrx_prims.py [S] [K]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spmv_research_tpu.utils.timing import measure_op  # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def _pcall(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(*args)


def report(name, t, nops):
    print(f"{name:<44} t={t*1e6:8.1f} us  {nops/t/1e9:7.1f} G elem/s",
          flush=True)


def probe_take0_invreg():
    def kernel(v_ref, idx_ref, o_ref):
        idx = idx_ref[:]

        def body(_, v):
            g = jnp.take_along_axis(v, idx, axis=0)
            return v + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    base = (np.arange(S)[:, None] // 8 * 8).astype(np.int32)
    u = rng.integers(0, 8, (S, 128)).astype(np.int32)
    idx = jnp.asarray(base + u)
    fn = lambda v, idx: _pcall(  # noqa: E731
        kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), v, idx)
    t = measure_op(fn, v, idx)
    report(f"take0 in-vreg (S={S})", t, S * 128 * K)


def probe_take0_blockloop():
    NB8 = S // 8

    def kernel(v_ref, idx_ref, o_ref):
        def body(_, v):
            outs = []
            for c in range(NB8):
                blk = v[c * 8:(c + 1) * 8, :]
                ib = idx_ref[c * 8:(c + 1) * 8, :]
                outs.append(jnp.take_along_axis(blk, ib, axis=0))
            g = jnp.concatenate(outs, axis=0)
            return v + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 8, (S, 128)), jnp.int32)
    fn = lambda v, idx: _pcall(  # noqa: E731
        kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), v, idx)
    t = measure_op(fn, v, idx)
    report(f"take0 per-8-block loop (S={S})", t, S * 128 * K)


def probe_octacc():
    def kernel(r_ref, oct_ref, o_ref):
        octv = oct_ref[:]

        def body(_, acc):
            rows = [acc[o * 8:(o + 1) * 8, :]
                    + jnp.where(octv == o, r_ref[:], 0.0)
                    for o in range(8)]
            return jnp.concatenate(rows, axis=0) * (1.0 - 1e-30)
        o_ref[:] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((64, 128), jnp.float32))

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(size=(8, 128)), jnp.float32)
    octv = jnp.asarray(rng.integers(0, 8, (8, 128)), jnp.int32)
    fn = lambda r, o: _pcall(  # noqa: E731
        kernel, jax.ShapeDtypeStruct((64, 128), jnp.float32), r, o)
    t = measure_op(fn, r, octv)
    # one body = 8 masked adds of (8,128): report per chunk-plane time
    print(f"octacc per-chunk body (K={K}): {t/K*1e9:7.1f} ns/chunk "
          f"({8*128*K/t/1e9:6.1f} G slot/s)", flush=True)


def probe_axis1():
    def kernel(v_ref, idx_ref, o_ref):
        idx = idx_ref[:]

        def body(_, v):
            g = jnp.take_along_axis(v, idx, axis=1)
            return v + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (S, 128)), jnp.int32)
    fn = lambda v, idx: _pcall(  # noqa: E731
        kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), v, idx)
    t = measure_op(fn, v, idx)
    report(f"take1 axis=1 (S={S})", t, S * 128 * K)


if __name__ == "__main__":
    which = sys.argv[3] if len(sys.argv) > 3 else "all"
    if which in ("all", "t0"):
        probe_take0_invreg()
    if which in ("all", "t0b"):
        probe_take0_blockloop()
    if which in ("all", "acc"):
        probe_octacc()
    if which in ("all", "t1"):
        probe_axis1()
