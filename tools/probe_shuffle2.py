"""Second-round probes for the SELLW kernel: batched variants.

  1. take_along_axis(axis=1) on 3D (B,8,128) — batched sublane pick
     (can the per-chunk window pick vectorize across chunks?)
  2. realistic window-load loop: G slices from a VMEM table into scratch
  3. axis-1 shuffle at tile scale S=1024
  4. strided subsample v[:, w-1::w]
  5. full simulated SELLW tile inner loop (all stages fused, one chunk-tile)

Run:  python tools/probe_shuffle2.py
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


def _pcall(kernel, out_shape, args, smem_idx=()):
    in_specs = []
    for i in range(len(args)):
        space = pltpu.SMEM if i in smem_idx else pltpu.VMEM
        in_specs.append(pl.BlockSpec(memory_space=space))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )(*args)


def probe_axis1_3d(B=128, K=256):
    def kernel(v_ref, idx_ref, o_ref):
        def body(_, v):
            g = jnp.take_along_axis(v, idx_ref[:], axis=1)
            return v + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(B, 8, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 8, (B, 8, 128)), jnp.int32)
    try:
        fn = lambda v, idx: _pcall(kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), (v, idx))
        t = measure_op(fn, v, idx) / K
        print(f"3D axis1(sublane-pick) (B={B},8,128): {t*1e9:.1f} ns/op "
              f"{B*8*128/t/1e9:.1f} G elem/s", flush=True)
    except Exception as e:
        print(f"3D axis1 batched: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


def probe_axis1_big(S=1024, K=256):
    def kernel(v_ref, idx_ref, o_ref):
        def body(_, v):
            g = jnp.take_along_axis(v, idx_ref[:], axis=1)
            return v + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, v_ref[:])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (S, 128)), jnp.int32)
    fn = lambda v, idx: _pcall(kernel, jax.ShapeDtypeStruct(v.shape, v.dtype), (v, idx))
    t = measure_op(fn, v, idx) / K
    print(f"axis1 shuffle (S={S}): {t*1e9:.1f} ns/op {S*128/t/1e9:.1f} G elem/s",
          flush=True)


def probe_winload(NC=128, R=1344, K=16):
    """Load NC windows (8,128) from table into a (NC*8,128) scratch, K reps."""
    def kernel(tab_ref, iv_ref, o_ref, scratch):
        def rep(_, carry):
            def body(c, acc):
                i = iv_ref[c]
                scratch[pl.ds(8 * c, 8), :] = tab_ref[pl.ds(i, 8), :]
                return acc
            jax.lax.fori_loop(0, NC, body, 0)
            return carry + scratch[0, 0] * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, rep, jnp.zeros((8, 128), jnp.float32))

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.uniform(size=(R, 128)), jnp.float32)
    iv = jnp.asarray(rng.integers(0, R - 8, (NC,)), jnp.int32)

    def fn(tab, iv):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((NC * 8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        )(tab, iv)

    t = measure_op(fn, tab, iv, k_lo=2, k_hi=10) / K
    print(f"window-load loop (NC={NC}): {t/NC*1e9:.1f} ns/window "
          f"({t*1e6:.2f} us per {NC})", flush=True)


def probe_strided(S=1024, w=4, K=256):
    def kernel(v_ref, o_ref):
        def body(_, acc):
            g = v_ref[:][:, w - 1::w]
            return acc + g * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((S, 128 // w), jnp.float32))

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    fn = lambda v: _pcall(kernel, jax.ShapeDtypeStruct((S, 128 // w), jnp.float32), (v,))
    t = measure_op(fn, v) / K
    print(f"strided [:, {w-1}::{w}] (S={S}): {t*1e9:.1f} ns/op", flush=True)


def probe_sellw_sim(NC=128, R=1344, K=8, G=4):
    """Simulated full SELLW tile: NC chunks, windows shared by groups of G.
    Stages: window loads, batched sublane-pick (3D), batched lane-pick,
    FMA, 7-stage segmented lane scan. Reports ns/slot."""
    S = NC * 8

    def kernel(tab_ref, iv_ref, sub_ref, lane_ref, val_ref, g_ref, o_ref, wins):
        def rep(_, acc):
            def load(c, z):
                i = iv_ref[c]
                wins[pl.ds(8 * c * G, 8), :] = tab_ref[pl.ds(i, 8), :]
                return z
            jax.lax.fori_loop(0, NC // G, load, 0)
            w3 = wins[:].reshape(NC // G, 8, 128)
            sub = sub_ref[:].reshape(NC // G, G * 8, 128)
            picked = jnp.take_along_axis(
                jnp.broadcast_to(w3[:, None], (NC // G, 1, 8, 128)).reshape(
                    NC // G, 8, 128)[:, None].repeat(1, axis=1), sub[..., None]
                if False else sub, axis=1) if False else None
            # batched sublane pick: window w3[c] indexed by sub[c] (G*8,128)
            picked = jnp.take_along_axis(w3, sub % 8, axis=1)  # (NC//G, G*8, 128)
            v = picked.reshape(S, 128)
            v = jnp.take_along_axis(v, lane_ref[:], axis=1)
            v = v * val_ref[:]
            guards = g_ref[:]
            for k in range(7):
                t = pltpu.roll(v, 128 - (1 << k), 1)
                keep = ((guards >> k) & 1) != 0
                v = v + jnp.where(keep, t, 0.0)
            return acc + v * 1e-30
        o_ref[:] = jax.lax.fori_loop(0, K, rep, jnp.zeros((S, 128), jnp.float32))

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.uniform(size=(R, 128)), jnp.float32)
    iv = jnp.asarray(rng.integers(0, R - 8, (NC // G,)), jnp.int32)
    sub = jnp.asarray(rng.integers(0, 8, (S, 128)), jnp.int32)
    lane = jnp.asarray(rng.integers(0, 128, (S, 128)), jnp.int32)
    val = jnp.asarray(rng.uniform(size=(S, 128)), jnp.float32)
    gm = jnp.asarray(rng.integers(0, 127, (S, 128)), jnp.int32)

    def fn(*a):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S // G if False else (NC // G) * 8, 128),
                                       jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        )(*a)

    try:
        t = measure_op(fn, tab, iv, sub, lane, val, gm, k_lo=2, k_hi=10) / K
        slots = S * 128
        print(f"SELLW sim tile (NC={NC},G={G}): {t*1e6:.2f} us/tile "
              f"{t/slots*1e12:.1f} ps/slot {slots/t/1e9:.2f} G slot/s", flush=True)
    except Exception as e:
        print(f"SELLW sim: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    probe_axis1_big()
    probe_axis1_3d()
    probe_strided()
    probe_winload()
    probe_sellw_sim(G=1)
    probe_sellw_sim(G=4)
