#!/usr/bin/env python
"""Ablate the SELLW kernel: which per-slot VPU ops cost what, on real kernel
shapes (small per-chunk outputs, VMEM-resident x plane)."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

SUB, LANES = 8, 128
NCH = 24576
NB = 64
X_ROWS = 1400


def measure_raw(fn, *args, k_lo=4, k_hi=24, reps=7):
    """carry = first arg, threaded through fn directly."""
    def chain(k):
        @jax.jit
        def c(x, *rest):
            def body(_, v):
                return fn(v, *rest)
            x = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(x[:8])
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
    rng = np.random.default_rng(0)
    word = jnp.asarray(rng.integers(0, 2**25, size=(NCH * SUB, LANES),
                                    dtype=np.int64).astype(np.int32))
    vals_np = rng.random((NCH * SUB, LANES), dtype=np.float32)
    wrow = jnp.asarray(rng.integers(0, X_ROWS, size=NCH * SUB,
                                    dtype=np.int64).astype(np.int32))
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))
    vals = jnp.asarray(vals_np)

    in_bytes = NCH * SUB * LANES * 8
    slots = NCH * SUB * LANES
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec((X_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    carry0 = jnp.zeros((NCH, LANES), jnp.float32)
    cspec = pl.BlockSpec((NB, LANES), blk, memory_space=pltpu.VMEM)

    def variant(name, kernel_body, G=2, fill=True):
        """kernel_body(w, v, wins) -> list of G (nb_sub) planes; carry added
        to plane 0 so the chain threads through the kernel itself."""
        ospecs = tuple(pl.BlockSpec((NB, LANES), blk,
                                    memory_space=pltpu.VMEM)
                       for _ in range(G))
        oshape = tuple(jax.ShapeDtypeStruct((NCH, LANES), jnp.float32)
                       for _ in range(G))

        if fill:
            def k(wrow_ref, c_ref, word_ref, val_ref, x2d_ref, *rest):
                orefs, wins_ref = rest[:G], rest[G]
                i = pl.program_id(0)

                def fl(j, _):
                    wr = wrow_ref[i * NB * SUB + j]
                    wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
                    return 0

                jax.lax.fori_loop(0, NB * SUB, fl, 0, unroll=True)
                planes = kernel_body(word_ref[:], val_ref[:], wins_ref[:])
                orefs[0][:] = planes[0] * 1e-30 + c_ref[:]
                for g in range(1, G):
                    orefs[g][:] = planes[g]

            def f(c, v, w, wr, x):
                return pl.pallas_call(
                    k, out_shape=oshape, grid=(NCH // NB,),
                    in_specs=[sspec, cspec, vspec, vspec, xspec],
                    out_specs=ospecs,
                    scratch_shapes=[pltpu.VMEM((NB * SUB, LANES),
                                               jnp.float32)],
                    compiler_params=params)(wr, c, w, v, x)[0]
            args = (carry0, vals, word, wrow, x2d)
        else:
            def k(c_ref, word_ref, val_ref, *orefs):
                planes = kernel_body(word_ref[:], val_ref[:], val_ref[:])
                orefs[0][:] = planes[0] * 1e-30 + c_ref[:]
                for g in range(1, G):
                    orefs[g][:] = planes[g]

            def f(c, v, w):
                return pl.pallas_call(
                    k, out_shape=oshape, grid=(NCH // NB,),
                    in_specs=[cspec, vspec, vspec], out_specs=ospecs,
                    compiler_params=params)(c, w, v)[0]
            args = (carry0, vals, word)

        t = measure_raw(f, *args)
        print(f"{name:<52} t={t*1e6:8.1f} us  "
              f"{in_bytes/t/1e9:6.1f} GB/s-in  {slots/t/1e9:6.1f} Gslot/s")

    def full_body(stages, G):
        def b(w, v, wins):
            r = jnp.take_along_axis(wins, w & 0x7F, axis=1) * v
            for k in range(stages):
                guard = ((w >> (7 + k)) & 1) != 0
                r = r + jnp.where(guard, pltpu.roll(r, 1 << k, 1), 0.0)
            E = jnp.take_along_axis(r, (w >> 14) & 0x7F, axis=1)
            live = ((w >> 21) & 1) != 0
            bid = (w >> 22) & (G - 1) if G > 1 else 0
            return [jnp.where(live & (bid == g) if G > 1 else live, E, 0.0)
                    .reshape(NB, SUB, LANES).sum(axis=1) for g in range(G)]
        return b

    variant("FULL stages=5 G=2 (current)", full_body(5, 2), G=2)
    variant("stages=2 G=2", full_body(2, 2), G=2)
    variant("stages=0 G=2 (no scan)", full_body(0, 2), G=2)
    variant("stages=5 G=1", full_body(5, 1), G=1)
    variant("stages=5 G=4", full_body(5, 4), G=4)
    variant("stages=5 G=2 nofill", full_body(5, 2), G=2, fill=False)
    variant("stages=2 G=1 nofill", full_body(2, 1), G=1, fill=False)

    # scan via float-multiply guards (select-free): guard as float 0/1 derived
    def mul_scan_body(stages, G):
        def b(w, v, wins):
            r = jnp.take_along_axis(wins, w & 0x7F, axis=1) * v
            for k in range(stages):
                gf = ((w >> (7 + k)) & 1).astype(jnp.float32)
                r = r + pltpu.roll(r, 1 << k, 1) * gf
            E = jnp.take_along_axis(r, (w >> 14) & 0x7F, axis=1)
            live = ((w >> 21) & 1) != 0
            bid = (w >> 22) & (G - 1)
            return [jnp.where(live & (bid == g), E, 0.0)
                    .reshape(NB, SUB, LANES).sum(axis=1) for g in range(G)]
        return b

    variant("stages=5 G=2 mul-guard scan", mul_scan_body(5, 2), G=2)

    # extraction without eidx pick: mask E at part ends computed from scan?
    # cheaper extract: single masked pass, bid-free, then one sublane sum
    def cheap_extract(stages):
        def b(w, v, wins):
            r = jnp.take_along_axis(wins, w & 0x7F, axis=1) * v
            for k in range(stages):
                guard = ((w >> (7 + k)) & 1) != 0
                r = r + jnp.where(guard, pltpu.roll(r, 1 << k, 1), 0.0)
            E = jnp.take_along_axis(r, (w >> 14) & 0x7F, axis=1)
            live = ((w >> 21) & 1) != 0
            P = jnp.where(live, E, 0.0)
            z = P.reshape(NB, SUB, LANES).sum(axis=1)
            return [z, z * 0.0]
        return b

    variant("stages=5, single-mask extract (G-free)", cheap_extract(5), G=2)


if __name__ == "__main__":
    main()
