"""TPU microbenchmarks that decide the SpMV kernel architecture.

Run on the real chip:  python tools/tpu_probe.py

Notes learned the hard way:
* arrays closed over by a jitted fn are inlined as HLO constants (and the
  axon remote-compile rejects big programs) — always pass format pytrees as
  jit arguments;
* benchmark chains must carry a FULL-ARRAY dependency between iterations or
  XLA dead-codes all but the last (scalar-feedback chains collapse).
"""

import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def bench(fn, *args, inner=10, reps=5):
    """fn(*args) -> array; times a chain of `inner` dependent applications.
    The output is folded back into the first argument with a full-array op."""

    @jax.jit
    def chained(*a):
        x = a[0]
        for _ in range(inner):
            r = fn(x, *a[1:])
            # full-array feedback; tiny scale keeps values stable
            pad = jnp.resize(r, x.shape).astype(x.dtype)
            x = x + pad * 1e-30
        return x

    out = jax.block_until_ready(chained(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(*args))
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts)


def main():
    dev = jax.devices()[0]
    print("device:", dev, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)

    # 1. stream bandwidth (read+write, single fused elementwise op)
    N = 64 * 1024 * 1024
    a = jnp.ones((N,), jnp.float32)
    t = bench(lambda v: v * 1.5 + 2.0, a, inner=10)
    print(f"stream: {N*4*2/t/1e9:.1f} GB/s (r+w), t/iter={t*1e6:.0f}us", flush=True)

    # 2. gather throughput
    M = 8 * 1024 * 1024
    n = 1024 * 1024
    idx = jnp.asarray(rng.integers(0, n, M), jnp.int32)
    x = jnp.asarray(rng.uniform(size=n), jnp.float32)
    t = bench(lambda v, i: jnp.take(v, i), x, idx, inner=5)
    print(f"gather random 8M from 1M: {M/t/1e9:.3f} G elem/s (t={t*1e6:.0f}us)", flush=True)
    idx_s = jnp.sort(idx)
    t = bench(lambda v, i: jnp.take(v, i), x, idx_s, inner=5)
    print(f"gather sorted: {M/t/1e9:.3f} G elem/s", flush=True)
    # small-table gather (VMEM-resident table)
    n2 = 8192
    idx2 = jnp.asarray(rng.integers(0, n2, M), jnp.int32)
    x2 = jnp.asarray(rng.uniform(size=n2), jnp.float32)
    t = bench(lambda v, i: jnp.take(v, i), x2, idx2, inner=5)
    print(f"gather from 8k table: {M/t/1e9:.3f} G elem/s", flush=True)

    # 3. segment_sum scatter cost in isolation
    segs = jnp.asarray(np.sort(rng.integers(0, 170998, M)), jnp.int32)
    vals = jnp.asarray(rng.uniform(size=M), jnp.float32)
    t = bench(lambda v, s: jax.ops.segment_sum(v, s, num_segments=170999,
                                               indices_are_sorted=True),
              vals, segs, inner=3)
    print(f"segment_sum 8M->171k sorted: {M/t/1e9:.3f} G elem/s (t={t*1e6:.0f}us)", flush=True)

    # 4. formats on scircuit twin — pass A as jit ARG
    from spmv_research_tpu.gen import generate_from_line
    from spmv_research_tpu.convert import build_csr, build_ell, build_sellcs
    from spmv_research_tpu.ops.dispatch import _lookup, _SPMV

    line = "170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 tw"
    host, _ = generate_from_line(line)
    print(f"twin: m={host.m} nnz={host.nnz} maxrow={int(host.row_lengths().max())}", flush=True)
    xv = jnp.asarray(rng.uniform(size=host.n), jnp.float32)
    nnz = host.nnz

    def bench_fmt(A, name):
        f = _lookup(_SPMV, A.format_name, "xla")
        def run(v, fmt):
            y = f(fmt, v)
            return v + jnp.resize(y, v.shape) * 1e-30
        @jax.jit
        def chained(v, fmt):
            for _ in range(10):
                v = run(v, fmt)
            return v
        jax.block_until_ready(chained(xv, A))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(xv, A))
            ts.append((time.perf_counter() - t0) / 10)
        t = min(ts)
        print(f"{name}: t={t*1e6:.0f}us {2*nnz/t/1e9:.2f} GFLOPS {nnz/t/1e9:.3f} Gnnz/s", flush=True)

    bench_fmt(build_csr(host), "CSR xla segsum")
    bench_fmt(build_ell(host), "ELL xla")
    bench_fmt(build_sellcs(host, C=8, sigma=4096), "SELL-8-4096 xla")
    bench_fmt(build_sellcs(host, C=32, sigma=host.m), "SELL-32-global xla")

    # 5. pallas vmem gather feasibility
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for name, shape in [("1D idx", (131072,)), ("2D idx", (8, 16384))]:
        try:
            nn = 65536
            xs = jnp.asarray(rng.uniform(size=nn), jnp.float32)
            ii = jnp.asarray(rng.integers(0, nn, shape), jnp.int32)

            def kern(x_ref, idx_ref, o_ref):
                o_ref[:] = jnp.take(x_ref[:], idx_ref[:].reshape(-1),
                                    axis=0).reshape(idx_ref.shape)

            @jax.jit
            def f(xa, ia):
                return pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(xa, ia)

            r = jax.block_until_ready(f(xs, ii))
            ok = np.allclose(np.asarray(r).reshape(-1),
                             np.asarray(xs)[np.asarray(ii).reshape(-1)])
            t = bench(lambda xa, ia: f(xa, ia).reshape(-1)[:xa.shape[0]], xs, ii, inner=5)
            cnt = int(np.prod(shape))
            print(f"pallas vmem take {name}: correct={ok} {cnt/t/1e9:.3f} G elem/s", flush=True)
        except Exception as e:
            print(f"pallas vmem take {name} FAILED:", type(e).__name__, str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
