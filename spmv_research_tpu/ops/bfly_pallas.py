"""Pallas TPU executor for the BFLY routed-butterfly SpMV.

Arrays are tiled (S, 128) with flat position p = s·128 + l. Exchange stages
use the XOR-partner identity: for d < 128 the partner stays within the lane
row (select between lane-rolls ±d); for d ≥ 128 it stays within the lane
(sublane rolls ±d/128). Linear shifts (fill/scan) for d < 128 cross row
boundaries and use the 3-op construct roll₁(d) + roll₀(1) + lane select.

Each pipeline section is its own ``pallas_call`` (v round-trips through HBM
between sections, ~40 µs of traffic at N=2²⁰) so per-call VMEM stays ~25 MB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bfly import Bfly, _spread_x
from .dispatch import register_spmv

LANES = 128


def _lane_iota(S):
    return jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)


def _sub_iota(S):
    return jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0)


def _xor_partner(v, k, S):
    d = 1 << k
    if d < LANES:
        bit = (_lane_iota(S) & d) != 0
        return jnp.where(bit, pltpu.roll(v, d, 1), pltpu.roll(v, LANES - d, 1))
    D = d // LANES
    bit = (_sub_iota(S) & D) != 0
    return jnp.where(bit, pltpu.roll(v, D, 0), pltpu.roll(v, S - D, 0))


def _flat_shift(v, d, S):
    """shifted[p] = v[p - d] (row-major 2D; wraparound rows are guarded by
    the callers' masks)."""
    if d % LANES == 0:
        return pltpu.roll(v, d // LANES, 0)
    u = pltpu.roll(v, d, 1)
    w = pltpu.roll(u, 1, 0)
    return jnp.where(_lane_iota(S) >= d, u, w)


def _xor_net_kernel(stages, S, v_ref, B_ref, o_ref):
    """Default-keep exchange network: out = B ? partner : v."""
    v = v_ref[:]
    for (w, b, k) in stages:
        partner = _xor_partner(v, k, S)
        bb = ((B_ref[w] >> b) & 1) != 0
        v = jnp.where(bb, partner, v)
    o_ref[:] = v


def _fill_kernel(stages, S, v_ref, w_ref, o_ref):
    v = v_ref[:]
    words = w_ref[:]
    for k in stages:
        take = ((words >> k) & 1) != 0
        v = jnp.where(take, _flat_shift(v, 1 << k, S), v)
    o_ref[:] = v


def _scan_kernel(stages, S, v_ref, g_ref, o_ref):
    v = v_ref[:]
    guards = g_ref[:]
    for k in stages:
        take = ((guards >> k) & 1) != 0
        v = v + jnp.where(take, _flat_shift(v, 1 << k, S), 0.0)
    o_ref[:] = v


def _call(kernel_fn, v, *arrays):
    interpret = jax.default_backend() not in ("tpu",)
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(arrays)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(v, *arrays)


def _xor_net(v, B, stages):
    # (measured: splitting calls per mask word to shrink per-call VMEM does
    # NOT move the N=2²⁰ per-stage cost — the cliff is not VMEM pressure)
    if not stages:
        return v
    S = v.shape[0]
    return _call(partial(_xor_net_kernel, stages, S), v,
                 B.reshape(-1, S, LANES))


def _full_kernel(meta, v_ref, wB, fw, pB, vals, sg, cB, valid,
                 o_ref):
    """The whole routing program in one kernel (one Mosaic compile, no HBM
    round-trips between sections)."""
    (S, widen_stages, fill_stages, perm_stages, scan_stages,
     compact_stages) = meta
    v = v_ref[:]
    for (w, b, k) in widen_stages:
        partner = _xor_partner(v, k, S)
        bb = ((wB[w] >> b) & 1) != 0
        v = jnp.where(bb, partner, v)
    words = fw[:]
    for k in fill_stages:
        take = ((words >> k) & 1) != 0
        v = jnp.where(take, _flat_shift(v, 1 << k, S), v)
    for (w, b, k) in perm_stages:
        partner = _xor_partner(v, k, S)
        bb = ((pB[w] >> b) & 1) != 0
        v = jnp.where(bb, partner, v)
    v = v * vals[:]
    guards = sg[:]
    for k in scan_stages:
        take = ((guards >> k) & 1) != 0
        v = v + jnp.where(take, _flat_shift(v, 1 << k, S), 0.0)
    for (w, b, k) in compact_stages:
        partner = _xor_partner(v, k, S)
        bb = ((cB[w] >> b) & 1) != 0
        v = jnp.where(bb, partner, v)
    o_ref[:] = v * valid[:]


# NOTE: intentionally NOT registered — a single 132-stage Mosaic kernel takes
# many minutes to compile on this stack. Kept for experimentation:
# call directly or register under "pallas_fused" when compile times allow.
def spmv_bfly_pallas_fused(A: Bfly, x: jnp.ndarray) -> jnp.ndarray:
    N = A.N
    S = N // LANES
    v = _spread_x(x.astype(A.vals.dtype), A.n, N, A.sigma_x).reshape(S, LANES)
    meta = (S, A.widen_stages, A.fill_stages, A.perm_stages, A.scan_stages,
            A.compact_stages)
    v = _call(partial(_full_kernel, meta), v,
              A.widen_B.reshape(-1, S, LANES),
              A.fill_words.reshape(S, LANES),
              A.perm_B.reshape(-1, S, LANES),
              A.vals.reshape(S, LANES), A.scan_guards.reshape(S, LANES),
              A.compact_B.reshape(-1, S, LANES),
              A.out_valid.reshape(S, LANES))
    return v.reshape(-1)[:: 1 << A.sigma_y][: A.m]


@register_spmv("BFLY", "pallas")
def spmv_bfly_pallas(A: Bfly, x: jnp.ndarray) -> jnp.ndarray:
    """Per-section pallas calls — the default: the single fused kernel
    (pallas_fused) compiles for many minutes in Mosaic; six small kernels
    compile fast and cost only ~40 us of extra HBM round-trips."""
    N = A.N
    S = N // LANES
    v = _spread_x(x.astype(A.vals.dtype), A.n, N, A.sigma_x).reshape(S, LANES)

    v = _xor_net(v, A.widen_B, A.widen_stages)
    if A.fill_stages:
        v = _call(partial(_fill_kernel, A.fill_stages, S), v,
                  A.fill_words.reshape(S, LANES))
    v = _xor_net(v, A.perm_B, A.perm_stages)
    v = v * A.vals.reshape(S, LANES)
    if A.scan_stages:
        v = _call(partial(_scan_kernel, A.scan_stages, S), v,
                  A.scan_guards.reshape(S, LANES))
    v = _xor_net(v, A.compact_B, A.compact_stages)
    v = v * A.out_valid.reshape(S, LANES)
    return v.reshape(-1)[:: 1 << A.sigma_y][: A.m]
