#!/usr/bin/env python
"""Stage-by-stage microbenchmark of the SELLW kernel pipeline on TPU.

Measures achieved HBM bandwidth of incrementally larger slices of the SELLW
kernel (stream-only -> +lane gather -> +scan -> +extract -> +x fill) to find
where the bandwidth goes. Roofline context: v5e HBM = 819 GB/s.
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spmv_research_tpu.utils.timing import measure_op  # noqa: E402

SUB, LANES = 8, 128


def run(name, fn, *args, bytes_touched):
    t = measure_op(fn, *args, k_lo=4, k_hi=24, reps=5)
    gbps = bytes_touched / t / 1e9
    print(f"{name:<34} t={t*1e6:8.1f} us   {gbps:7.1f} GB/s")
    return t


def main():
    NCH = 24576             # chunks
    NB = 64                 # chunks per grid step
    STAGES = 5
    G = 2
    X_ROWS = 1400           # ~179k x entries -> VMEM resident
    rng = np.random.default_rng(0)

    word = jnp.asarray(rng.integers(0, 2**25, size=(NCH * SUB, LANES),
                                    dtype=np.int64).astype(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    wrow = jnp.asarray(rng.integers(0, X_ROWS, size=NCH * SUB,
                                    dtype=np.int64).astype(np.int32))
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))

    in_bytes = NCH * SUB * LANES * 8            # word + vals
    out_bytes = NCH * LANES * 4 * G
    total = in_bytes + out_bytes
    print(f"planes: {NCH} chunks, in {in_bytes/2**20:.1f} MiB, "
          f"out {out_bytes/2**20:.1f} MiB")

    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    ospecs = tuple(pl.BlockSpec((NB, LANES), blk, memory_space=pltpu.VMEM)
                   for _ in range(G))
    oshape = tuple(jax.ShapeDtypeStruct((NCH, LANES), jnp.float32)
                   for _ in range(G))
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def call(kernel, *ins, extra_in_specs=(), scratch=()):
        return pl.pallas_call(
            kernel, out_shape=oshape, grid=(NCH // NB,),
            in_specs=list(extra_in_specs) + [vspec, vspec],
            out_specs=ospecs, scratch_shapes=list(scratch),
            compiler_params=params)(*ins)

    # --- 1. stream only: read word+vals, reduce-sum sublanes -> out ---
    def k_stream(word_ref, val_ref, o0, o1):
        v = val_ref[:] + word_ref[:].astype(jnp.float32)
        z = v.reshape(NB, SUB, LANES).sum(axis=1)
        o0[:] = z
        o1[:] = z

    run("stream(read 8B/slot + reduce)",
        lambda v, w: call(k_stream, w, v)[0], vals, word,
        bytes_touched=total)

    # --- 2. + lane-pick gather ---
    def k_gather(word_ref, val_ref, o0, o1):
        w = word_ref[:]
        v = jnp.take_along_axis(val_ref[:], w & 0x7F, axis=1)
        z = v.reshape(NB, SUB, LANES).sum(axis=1)
        o0[:] = z
        o1[:] = z

    run("+ lane-pick take_along_axis",
        lambda v, w: call(k_gather, w, v)[0], vals, word,
        bytes_touched=total)

    # --- 3. + scan stages ---
    def k_scan(word_ref, val_ref, o0, o1):
        w = word_ref[:]
        v = val_ref[:]
        for k in range(STAGES):
            guard = ((w >> (7 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
        z = v.reshape(NB, SUB, LANES).sum(axis=1)
        o0[:] = z
        o1[:] = z

    run(f"+ {STAGES}-stage segmented scan",
        lambda v, w: call(k_scan, w, v)[0], vals, word,
        bytes_touched=total)

    # --- 4. + eidx pick + masked extract (full minus fill) ---
    def k_extract(word_ref, val_ref, o0, o1):
        w = word_ref[:]
        v = jnp.take_along_axis(val_ref[:], w & 0x7F, axis=1) * val_ref[:]
        for k in range(STAGES):
            guard = ((w >> (7 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
        E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
        live = ((w >> 21) & 1) != 0
        bid = (w >> 22) & (G - 1)
        for g, o in enumerate((o0, o1)):
            o[:] = jnp.where(live & (bid == g), E, 0.0).reshape(
                NB, SUB, LANES).sum(axis=1)

    run("+ eidx pick + G masked extracts",
        lambda v, w: call(k_extract, w, v)[0], vals, word,
        bytes_touched=total)

    # --- 5. full kernel with x fill loop ---
    xspec = pl.BlockSpec((X_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def k_full(wrow_ref, word_ref, val_ref, x2d_ref, o0, o1, wins_ref):
        i = pl.program_id(0)

        def fill(j, _):
            wr = wrow_ref[i * NB * SUB + j]
            wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
            return 0

        jax.lax.fori_loop(0, NB * SUB, fill, 0, unroll=True)
        w = word_ref[:]
        v = jnp.take_along_axis(wins_ref[:], w & 0x7F, axis=1) * val_ref[:]
        for k in range(STAGES):
            guard = ((w >> (7 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
        E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
        live = ((w >> 21) & 1) != 0
        bid = (w >> 22) & (G - 1)
        for g, o in enumerate((o0, o1)):
            o[:] = jnp.where(live & (bid == g), E, 0.0).reshape(
                NB, SUB, LANES).sum(axis=1)

    def full(wr, w, v, x):
        return pl.pallas_call(
            k_full, out_shape=oshape, grid=(NCH // NB,),
            in_specs=[sspec, vspec, vspec, xspec],
            out_specs=ospecs,
            scratch_shapes=[pltpu.VMEM((NB * SUB, LANES), jnp.float32)],
            compiler_params=params)(wr, w, v, x)

    run("full SELLW (fill+gather+scan+ext)",
        lambda v, wr, w, x: full(wr, w, v, x)[0], vals, wrow, word, x2d,
        bytes_touched=total)

    # --- 5b. fill via one big dynamic gather? measure fill alone ---
    def k_fill_only(wrow_ref, word_ref, val_ref, x2d_ref, o0, o1, wins_ref):
        i = pl.program_id(0)

        def fill(j, _):
            wr = wrow_ref[i * NB * SUB + j]
            wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
            return 0

        jax.lax.fori_loop(0, NB * SUB, fill, 0, unroll=True)
        v = wins_ref[:] + val_ref[:] + word_ref[:].astype(jnp.float32)
        z = v.reshape(NB, SUB, LANES).sum(axis=1)
        o0[:] = z
        o1[:] = z

    def fill_only(wr, w, v, x):
        return pl.pallas_call(
            k_fill_only, out_shape=oshape, grid=(NCH // NB,),
            in_specs=[sspec, vspec, vspec, xspec],
            out_specs=ospecs,
            scratch_shapes=[pltpu.VMEM((NB * SUB, LANES), jnp.float32)],
            compiler_params=params)(wr, w, v, x)

    run("stream + fill loop only",
        lambda v, wr, w, x: fill_only(wr, w, v, x)[0], vals, wrow, word, x2d,
        bytes_touched=total)


if __name__ == "__main__":
    main()
