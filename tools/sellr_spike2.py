#!/usr/bin/env python
"""Bisect SELLR MXU-scatter regression: start from the fast per-chunk-RMW
kernel (606us) and add the new pieces one at a time."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

SUB, LANES = 8, 128
NCH = 24576
NB = 128
X_ROWS = 1664
Y_ROWS = 1664
NSTEPS = NCH // NB
GW = 8


def measure_raw(fn, *args, k_lo=4, k_hi=24, reps=7):
    def chain(k):
        @jax.jit
        def c(x, *rest):
            def body(_, v):
                return fn(v, *rest)
            return jnp.sum(jax.lax.fori_loop(0, k, body, x)[:8])
        return c
    lo, hi = chain(k_lo), chain(k_hi)
    for _ in range(2):
        float(np.asarray(lo(*args)))
        float(np.asarray(hi(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(lo(*args)))
        tl = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(hi(*args)))
        th = time.perf_counter() - t0
        ts.append((th - tl) / (k_hi - k_lo))
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(1)
    word = jnp.asarray(rng.integers(0, 2**22, size=(NCH * SUB, LANES),
                                    dtype=np.int64).astype(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    wrow_np = rng.integers(0, X_ROWS, NCH * SUB).astype(np.int32)
    trel_np = rng.integers(0, GW * SUB, NCH * SUB).astype(np.int32)
    ybase_np = (rng.integers(0, Y_ROWS // SUB - GW, NSTEPS) * SUB).astype(np.int32)
    yb_col = np.repeat(ybase_np, NB * SUB).astype(np.int32)
    wrow_pad = np.zeros(NSTEPS * 1024, np.int32)
    wrow_pad[(np.arange(NCH * SUB) // (NB * SUB)) * 1024
             + np.arange(NCH * SUB) % (NB * SUB)] = wrow_np
    wrow_a = jnp.asarray(wrow_pad)
    ybase_a = jnp.asarray(np.repeat(ybase_np, 1024))
    trel3 = jnp.asarray(np.broadcast_to(
        trel_np.reshape(NSTEPS, 1, NB * SUB), (NSTEPS, 8, NB * SUB)).copy())
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))

    slots = NCH * SUB * LANES
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    wspec1 = pl.BlockSpec((1024,), lambda i: (i,),
                          memory_space=pltpu.SMEM)
    ybspec = pl.BlockSpec((1024,), lambda i: (i,), memory_space=pltpu.SMEM)
    tspec = pl.BlockSpec((1, 8, NB * SUB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((X_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((Y_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def bench(name, use_trel, rmw_mode, fill_mode, do_mxu=False):
        def kernel(*refs):
            if use_trel:
                wrow_ref, yb_ref, trel_ref, word_ref, val_ref, x2d_ref, \
                    y_ref, wins_ref, y2_ref, y3_ref, y4_ref = refs
            else:
                wrow_ref, yb_ref, word_ref, val_ref, x2d_ref, y_ref, \
                    wins_ref, y2_ref, y3_ref, y4_ref = refs
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)
                y2_ref[:] = jnp.zeros_like(y2_ref)
                y3_ref[:] = jnp.zeros_like(y3_ref)
                y4_ref[:] = jnp.zeros_like(y4_ref)

            if fill_mode == "row512":
                def fill(j, _):
                    wins_ref[pl.ds(j, 1), :] = x2d_ref[
                        pl.ds(wrow_ref[j], 1), :]
                    return 0
                jax.lax.fori_loop(0, NB * SUB, fill, 0, unroll=True)
            else:  # slice per chunk
                def fill(c, _):
                    wins_ref[pl.ds(c * SUB, SUB), :] = x2d_ref[
                        pl.ds(wrow_ref[c * SUB], SUB), :]
                    return 0
                jax.lax.fori_loop(0, NB, fill, 0, unroll=True)

            w = word_ref[:]
            v = jnp.take_along_axis(wins_ref[:], w & 0x7F, axis=1) * val_ref[:]
            for k in range(3):
                guard = ((w >> (7 + k)) & 1) != 0
                v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
            E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
            P = jnp.where(((w >> 21) & 1) != 0, E, 0.0)

            if do_mxu == "s2only":
                t = trel_ref[0, 0:1, :]
                tgt = jax.lax.broadcasted_iota(
                    jnp.int32, (GW * SUB, NB * SUB), 0)
                S2 = (t == tgt).astype(jnp.float32)
                Z = P[0:GW * SUB, :] + S2[:, 0:LANES] * 1e-30
            elif do_mxu == "bf16":
                t = trel_ref[0, 0:1, :]
                tgt = jax.lax.broadcasted_iota(
                    jnp.int32, (GW * SUB, NB * SUB), 0)
                S2 = (t == tgt).astype(jnp.bfloat16)
                Z = jnp.dot(S2, P.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            elif do_mxu == "split3":
                t = trel_ref[0, 0:1, :]
                tgt = jax.lax.broadcasted_iota(
                    jnp.int32, (GW * SUB, NB * SUB), 0)
                S2 = (t == tgt).astype(jnp.bfloat16)
                P1 = P.astype(jnp.bfloat16)
                r1 = P - P1.astype(jnp.float32)
                P2 = r1.astype(jnp.bfloat16)
                P3 = (r1 - P2.astype(jnp.float32)).astype(jnp.bfloat16)
                Z = (jnp.dot(S2, P1, preferred_element_type=jnp.float32)
                     + jnp.dot(S2, P2, preferred_element_type=jnp.float32)
                     + jnp.dot(S2, P3, preferred_element_type=jnp.float32))
            elif do_mxu:
                t = trel_ref[0, 0:1, :]
                tgt = jax.lax.broadcasted_iota(
                    jnp.int32, (GW * SUB, NB * SUB), 0)
                S2 = (t == tgt).astype(jnp.float32)
                Z = jnp.dot(S2, P, preferred_element_type=jnp.float32)
            else:
                Z = P[0:GW * SUB, :]

            if rmw_mode == "chunk":
                wins_ref[:] = P
                def acc(c, _):
                    yb = wrow_ref[c * SUB] % (Y_ROWS - SUB)  # fake ybase
                    y_ref[pl.ds(yb, SUB), :] = (
                        y_ref[pl.ds(yb, SUB), :]
                        + wins_ref[pl.ds(c * SUB, SUB), :])
                    return 0
                jax.lax.fori_loop(0, NB, acc, 0, unroll=True)
            elif rmw_mode == "chunk2":
                wins_ref[:] = P
                def acc(c, _):
                    yb = wrow_ref[c * SUB] % (Y_ROWS - SUB)
                    tgt = y_ref if True else None
                    return 0
                # interleave two accumulators: even chunks -> y_ref,
                # odd chunks -> y2_scratch; merged at last step
                def acc2(c, _):
                    yb = wrow_ref[c * SUB] % (Y_ROWS - SUB)
                    @pl.when(c % 2 == 0)
                    def _():
                        y_ref[pl.ds(yb, SUB), :] = (
                            y_ref[pl.ds(yb, SUB), :]
                            + wins_ref[pl.ds(c * SUB, SUB), :])
                    @pl.when(c % 2 == 1)
                    def _():
                        y2_ref[pl.ds(yb, SUB), :] = (
                            y2_ref[pl.ds(yb, SUB), :]
                            + wins_ref[pl.ds(c * SUB, SUB), :])
                    return 0
                jax.lax.fori_loop(0, NB, acc2, 0, unroll=True)
                @pl.when(i == pl.num_programs(0) - 1)
                def _():
                    y_ref[:] = y_ref[:] + y2_ref[:]
            elif rmw_mode == "chunk4":
                wins_ref[:] = P
                refs4 = [y_ref, y2_ref, y3_ref, y4_ref]
                def acc4(c, _):
                    yb = wrow_ref[c * SUB] % (Y_ROWS - SUB)
                    for q in range(4):
                        @pl.when(c % 4 == q)
                        def _(q=q):
                            refs4[q][pl.ds(yb, SUB), :] = (
                                refs4[q][pl.ds(yb, SUB), :]
                                + wins_ref[pl.ds(c * SUB, SUB), :])
                    return 0
                jax.lax.fori_loop(0, NB, acc4, 0, unroll=True)
                @pl.when(i == pl.num_programs(0) - 1)
                def _():
                    y_ref[:] = (y_ref[:] + y2_ref[:]) + (y3_ref[:] + y4_ref[:])
            elif rmw_mode == "step":
                yb = yb_ref[0]
                y_ref[pl.ds(yb, GW * SUB), :] = (
                    y_ref[pl.ds(yb, GW * SUB), :] + Z)
            elif rmw_mode == "fixed":
                y_ref[0:GW * SUB, :] = y_ref[0:GW * SUB, :] + Z
            elif rmw_mode == "none":
                y_ref[0:GW * SUB, :] = Z

        in_specs = ([wspec1, ybspec] + ([tspec] if use_trel else [])
                    + [vspec, vspec, xspec])
        ins = [wrow_a, ybase_a] + ([trel3] if use_trel else [])

        def f(v, w, x):
            return pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((Y_ROWS, LANES),
                                                       jnp.float32),
                grid=(NSTEPS,),
                in_specs=in_specs, out_specs=yspec,
                scratch_shapes=[pltpu.VMEM((NB * SUB, LANES), jnp.float32),
                                pltpu.VMEM((Y_ROWS, LANES), jnp.float32),
                                pltpu.VMEM((Y_ROWS, LANES), jnp.float32),
                                pltpu.VMEM((Y_ROWS, LANES), jnp.float32)],
                compiler_params=params)(*ins, w, v, x)

        def g(x, v, w):
            y = f(v, w, x)
            return x * (1.0 + y[0, 0] * 1e-37)

        t = measure_raw(g, x2d, vals, word)
        print(f"{name:<56} t={t*1e6:8.1f} us  {slots/t/1e9:6.1f} Gslot/s")

    bench("per-chunk RMW 1 acc", False, "chunk", "row512")
    bench("per-chunk RMW 2 accs", False, "chunk2", "row512")
    bench("per-chunk RMW 4 accs", False, "chunk4", "row512")


if __name__ == "__main__":
    main()
