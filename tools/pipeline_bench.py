#!/usr/bin/env python
"""Pallas grid-pipeline throughput experiments: how to stream HBM at
speed-of-light on this TPU. Pure streaming kernels (no real compute) at
various block sizes / shapes / output regimes."""
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spmv_research_tpu.utils.timing import measure_op  # noqa: E402

SUB, LANES = 8, 128
NCH = 24576  # total chunks: in = 192 MiB (word+vals)


def run(name, fn, *args, bytes_touched):
    t = measure_op(fn, *args, k_lo=4, k_hi=24, reps=5)
    gbps = bytes_touched / t / 1e9
    print(f"{name:<44} t={t*1e6:8.1f} us   {gbps:7.1f} GB/s")


def main():
    rng = np.random.default_rng(0)
    word = jnp.asarray(rng.integers(0, 2**25, size=(NCH * SUB, LANES),
                                    dtype=np.int64).astype(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    in_bytes = NCH * SUB * LANES * 8
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # A: same-shape passthrough out (read 8B + write 4B per slot)
    def k_pass(word_ref, val_ref, o_ref):
        o_ref[:] = val_ref[:] + word_ref[:].astype(jnp.float32)

    for nb in (32, 64, 128, 256, 512):
        blk = lambda i: (i, 0)  # noqa: E731
        vspec = pl.BlockSpec((nb * SUB, LANES), blk, memory_space=pltpu.VMEM)

        def f(v, w, nb=nb, vspec=vspec):
            return pl.pallas_call(
                k_pass, out_shape=jax.ShapeDtypeStruct((NCH * SUB, LANES),
                                                       jnp.float32),
                grid=(NCH // nb,), in_specs=[vspec, vspec], out_specs=vspec,
                compiler_params=params)(w, v)

        run(f"passthrough nb={nb} (12B/slot)", f, vals, word,
            bytes_touched=in_bytes + NCH * SUB * LANES * 4)

    # B: reduce out (8B in per slot + tiny out), sweeping nb
    for nb in (64, 128, 256, 512, 1024):
        blk = lambda i: (i, 0)  # noqa: E731
        vspec = pl.BlockSpec((nb * SUB, LANES), blk, memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((nb, LANES), blk, memory_space=pltpu.VMEM)

        def k_red(word_ref, val_ref, o_ref, nb=nb):
            v = val_ref[:] + word_ref[:].astype(jnp.float32)
            o_ref[:] = v.reshape(nb, SUB, LANES).sum(axis=1)

        def f(v, w, nb=nb, vspec=vspec, ospec=ospec, k_red=k_red):
            return pl.pallas_call(
                k_red, out_shape=jax.ShapeDtypeStruct((NCH, LANES),
                                                      jnp.float32),
                grid=(NCH // nb,), in_specs=[vspec, vspec], out_specs=ospec,
                compiler_params=params)(w, v)

        run(f"sublane-reduce nb={nb} (8B/slot)", f, vals, word,
            bytes_touched=in_bytes + NCH * LANES * 4)

    # C: reduce via strided adds instead of reshape-sum
    nb = 256
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((nb * SUB, LANES), blk, memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((nb, LANES), blk, memory_space=pltpu.VMEM)

    def k_red2(word_ref, val_ref, o_ref):
        v = val_ref[:] + word_ref[:].astype(jnp.float32)
        r = v.reshape(nb, SUB * LANES)
        acc = (r[:, 0 * LANES:1 * LANES] + r[:, 1 * LANES:2 * LANES]
               + r[:, 2 * LANES:3 * LANES] + r[:, 3 * LANES:4 * LANES]
               + r[:, 4 * LANES:5 * LANES] + r[:, 5 * LANES:6 * LANES]
               + r[:, 6 * LANES:7 * LANES] + r[:, 7 * LANES:8 * LANES])
        o_ref[:] = acc

    def f(v, w):
        return pl.pallas_call(
            k_red2, out_shape=jax.ShapeDtypeStruct((NCH, LANES), jnp.float32),
            grid=(NCH // nb,), in_specs=[vspec, vspec], out_specs=ospec,
            compiler_params=params)(w, v)

    run("reshape-row reduce nb=256", f, vals, word,
        bytes_touched=in_bytes + NCH * LANES * 4)

    # D: XLA-only equivalent of the reduce (for reference)
    def f_xla(v, w):
        u = v + w.astype(jnp.float32)
        return u.reshape(NCH, SUB, LANES).sum(axis=1)

    run("XLA fused reduce (same math)", f_xla, vals, word,
        bytes_touched=in_bytes + NCH * LANES * 4)


if __name__ == "__main__":
    main()
