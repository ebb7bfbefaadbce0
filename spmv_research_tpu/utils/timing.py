"""Reliable device timing under asynchronous dispatch.

On this TPU stack ``block_until_ready`` returns before execution completes
(remote-executor semantics); only a device-to-host transfer synchronizes, and
it carries a large constant overhead. We therefore measure *differentially*:

    t_iter = (T(K_hi iterations) − T(K_lo iterations)) / (K_hi − K_lo)

where each T is wall time of a jitted chain of K dependent applications ending
in a scalar reduction that is transferred to host. The constant costs
(dispatch, relay round-trip, D2H, the reduction) cancel in the difference.

This replaces the reference's simple ``time_it`` loop (``lib/time_it.h``) whose
assumptions (synchronous kernel + cheap clock) don't hold here.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x) -> float:
    """Force completion; returns the scalar (host float)."""
    return float(np.asarray(x))


def make_chain(fn: Callable, k: int):
    """Jitted chain of k dependent applications of fn(x, *rest) -> array,
    ending in a scalar sum (the sync anchor). fn's output is folded back into
    x with a full-array dependency so no iteration can be dead-coded.

    Uses ``lax.fori_loop`` so fn's body compiles once regardless of k (a
    Python unroll of a large kernel makes compile time explode)."""

    @partial(jax.jit, static_argnums=())
    def chained(x, *rest):
        def body(_, v):
            r = fn(v, *rest)
            r = r.astype(v.dtype)
            if r.shape == v.shape:
                return v + r * 1e-30
            pad = jnp.resize(r.reshape(-1), v.shape)
            return v + pad * 1e-30
        x = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(x[:8])

    return chained


def measure_op(fn: Callable, *args, k_lo: int = 4, k_hi: int = 36,
               reps: int = 5, warmup: int = 2) -> float:
    """Median differential per-iteration time of fn(*args) in seconds."""
    lo = make_chain(fn, k_lo)
    hi = make_chain(fn, k_hi)
    for _ in range(warmup):
        _sync(lo(*args))
        _sync(hi(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(hi(*args))
        t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (k_hi - k_lo))
    return float(np.median(ts))


def measure_op_samples(fn: Callable, *args, k_lo: int = 4, k_hi: int = 36,
                       reps: int = 9, warmup: int = 2) -> np.ndarray:
    """All differential samples (for min/median/max protocol columns)."""
    lo = make_chain(fn, k_lo)
    hi = make_chain(fn, k_hi)
    for _ in range(warmup):
        _sync(lo(*args))
        _sync(hi(*args))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(hi(*args))
        t_hi = time.perf_counter() - t0
        out.append((t_hi - t_lo) / (k_hi - k_lo))
    return np.array(out)
