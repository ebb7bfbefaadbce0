"""Measure the CLOS engine on the real TPU (scircuit twin).

Run:  python tools/clos_tpu_test.py [--impl pallas,xla]
"""

import sys, time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from spmv_research_tpu.gen import generate_from_line
from spmv_research_tpu.convert import rcm_reorder
from spmv_research_tpu.convert.cache import cached_build
from spmv_research_tpu.ops.clos import build_clos
from spmv_research_tpu.ops import spmv
from spmv_research_tpu.utils.timing import measure_op

LINE = "170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 scircuit_twin"


def main():
    print("device:", jax.devices()[0], flush=True)
    t0 = time.time()
    host, _ = generate_from_line(LINE)
    host, _ = rcm_reorder(host)
    print(f"twin ready ({time.time()-t0:.1f}s) m={host.m} nnz={host.nnz}",
          flush=True)

    t0 = time.time()
    A = cached_build(build_clos, host, "clos", dtype=jnp.float32)
    print(f"clos build ({time.time()-t0:.1f}s) N={A.N} V={A.V} "
          f"fill={len(A.fill_stages)} scan={len(A.scan_stages)}", flush=True)

    rng = np.random.default_rng(0)
    x64 = rng.uniform(-1, 1, host.n)
    want = host.to_scipy() @ x64
    x = jnp.asarray(x64.astype(np.float32))

    impls = (sys.argv[sys.argv.index("--impl") + 1].split(",")
             if "--impl" in sys.argv else ["pallas"])
    for impl in impls:
        t0 = time.time()
        y = np.asarray(spmv(A, x, impl=impl))
        rel = np.abs(y - want) / np.maximum(np.abs(want), 1e-30)
        mape = float(np.mean(rel[np.abs(want) > 1e-12]))
        print(f"{impl}: first call {time.time()-t0:.1f}s mape={mape:.2e}",
              flush=True)
        t = measure_op(lambda xx, AA=A: spmv(AA, xx, impl=impl), x,
                       k_lo=4, k_hi=20)
        print(f"{impl}: {t*1e6:.0f} us/iter -> {host.nnz/t/1e9:.3f} Gnnz/s "
              f"({2*host.nnz/t/1e9:.2f} GFLOPS)", flush=True)


if __name__ == "__main__":
    main()
