"""Trace regions and profiling hooks.

Role of the reference's SDV tracing (``bench_spmv.cpp:321-363``:
``trace_begin_region("COMPUTATION-SpMV")`` brackets exactly the kernel
invocation) and its PAPI/ncu hooks — mapped onto ``jax.profiler``:

    with trace_region("COMPUTATION-SpMV"):
        y = spmv(A, x)

    start_profiler("/tmp/tb")    # then: tensorboard --logdir /tmp/tb
    ...
    stop_profiler()
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace_region(name: str):
    """Named trace annotation visible in jax.profiler / XProf timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_profiler() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def profile(logdir: str):
    start_profiler(logdir)
    try:
        yield
    finally:
        stop_profiler()
