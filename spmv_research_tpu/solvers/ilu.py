"""ILU(0) / IC(0) factorization and level-scheduled sparse triangular solves.

Required by BASELINE.json config #4 (beyond the reference's workloads; the
reference's preconditioning is Jacobi-only — ``bench_cg.cpp:116-135``).

TPU-native split (SURVEY.md §7 "hard parts"):
* numeric factorization is inherently sequential along rows → host-side
  (numpy row sweep; a C++ implementation can swap in transparently),
* triangular solves are level-scheduled: the host computes the dependency
  levels (rows within a level are independent), pads each level to uniform
  (rows × row-length) tiles, and the device executes one `lax.scan` over
  levels — each step is a dense gather-multiply-reduce, no data-dependent
  control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.host import HostCSR, INDEX_DTYPE


def ilu0(csr: HostCSR) -> Tuple[HostCSR, HostCSR]:
    """ILU(0): incomplete LU with zero fill-in on the pattern of A.

    Returns (L, U): L unit-lower-triangular (diagonal ones stored), U upper
    triangular. Host numeric (IKJ variant restricted to the sparsity
    pattern).
    """
    if csr.m != csr.n:
        raise ValueError("ILU0 requires square matrix")
    m = csr.m
    ia, ja = csr.ia.astype(np.int64), csr.ja.astype(np.int64)
    a = csr.a.astype(np.float64).copy()

    # column position lookup per row for pattern-restricted updates
    diag_ptr = np.full(m, -1, dtype=np.int64)
    for i in range(m):
        s, e = ia[i], ia[i + 1]
        row_cols = ja[s:e]
        # factor: for k in cols < i with a[ik] != 0
        for idx in range(s, e):
            k = ja[idx]
            if k >= i:
                break
            # a[i,k] /= u[k,k]
            dk = diag_ptr[k]
            if dk < 0 or a[dk] == 0.0:
                raise ZeroDivisionError(f"zero pivot at row {k}")
            a[idx] /= a[dk]
            lik = a[idx]
            # a[i,j] -= l[i,k] * u[k,j] for j > k on row i's pattern
            ks, ke = ia[k], ia[k + 1]
            k_cols = ja[ks:ke]
            sel = k_cols > k
            if not sel.any():
                continue
            u_cols = k_cols[sel]
            u_vals = a[ks:ke][sel]
            # match columns present in row i (pattern restriction)
            pos = np.searchsorted(row_cols, u_cols)
            pos = np.clip(pos, 0, row_cols.size - 1)
            hit = row_cols[pos] == u_cols
            a[s + pos[hit]] -= lik * u_vals[hit]
        dp = np.searchsorted(row_cols, i)
        if dp < row_cols.size and row_cols[dp] == i:
            diag_ptr[i] = s + dp
        else:
            raise ValueError(f"missing diagonal in row {i} (run fix_diagonal_zeros)")

    # split into L (strict lower + unit diag) and U (diag + upper)
    rows = np.repeat(np.arange(m, dtype=np.int64), csr.row_lengths())
    lower = rows > ja
    upper = rows <= ja
    L = _from_triplets(rows[lower], ja[lower], a[lower], m, add_unit_diag=True)
    U = _from_triplets(rows[upper], ja[upper], a[upper], m, add_unit_diag=False)
    return L, U


def ic0(csr: HostCSR) -> HostCSR:
    """IC(0): incomplete Cholesky on the lower-triangular pattern of SPD A.
    Returns L with A ≈ L·Lᵀ."""
    if csr.m != csr.n:
        raise ValueError("IC0 requires square matrix")
    m = csr.m
    Adense_cols = {}
    ia, ja = csr.ia.astype(np.int64), csr.ja.astype(np.int64)
    a = csr.a.astype(np.float64)
    # build per-row dicts of the lower pattern
    Lrows = [dict() for _ in range(m)]
    for i in range(m):
        for idx in range(ia[i], ia[i + 1]):
            j = ja[idx]
            if j <= i:
                Lrows[i][j] = a[idx]
    for i in range(m):
        for j in sorted(Lrows[i]):
            s = Lrows[i][j]
            for k in Lrows[i]:
                if k < j and k in Lrows[j]:
                    s -= Lrows[i][k] * Lrows[j][k]
            if j < i:
                Lrows[i][j] = s / Lrows[j][j]
            else:
                if s <= 0:
                    raise ValueError(f"IC0 breakdown at row {i} (not SPD enough)")
                Lrows[i][i] = np.sqrt(s)
    rows, cols, vals = [], [], []
    for i in range(m):
        for j, v in sorted(Lrows[i].items()):
            rows.append(i)
            cols.append(j)
            vals.append(v)
    return _from_triplets(np.array(rows, np.int64), np.array(cols, np.int64),
                          np.array(vals), m, add_unit_diag=False)


def _from_triplets(rows, cols, vals, m, add_unit_diag: bool) -> HostCSR:
    if add_unit_diag:
        rows = np.concatenate([rows, np.arange(m, dtype=np.int64)])
        cols = np.concatenate([cols, np.arange(m, dtype=np.int64)])
        vals = np.concatenate([vals, np.ones(m)])
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    ia = np.zeros(m + 1, dtype=np.int64)
    np.add.at(ia, rows + 1, 1)
    np.cumsum(ia, out=ia)
    return HostCSR(a=vals, ia=ia.astype(INDEX_DTYPE),
                   ja=cols.astype(INDEX_DTYPE), m=m, n=m)


# ---------------------------------------------------------------- trisolve

@dataclasses.dataclass
class LevelSchedule:
    """Level-scheduled triangular structure, padded uniform for `lax.scan`."""

    rows: jnp.ndarray      # (n_levels, R) row ids (pad: m)
    cols: jnp.ndarray      # (n_levels, R, W) off-diag column ids (pad: 0)
    vals: jnp.ndarray      # (n_levels, R, W) off-diag values (pad: 0)
    inv_diag: jnp.ndarray  # (n_levels, R) 1/diag per row (pad: 0)
    n_levels: int
    m: int
    lower: bool


def build_level_schedule(T: HostCSR, lower: bool = True,
                         dtype=jnp.float32) -> LevelSchedule:
    """Compute dependency levels: level(i) = 1 + max(level(j)) over off-diag
    neighbours j of row i (j < i for lower, j > i for upper)."""
    m = T.m
    ia, ja = T.ia.astype(np.int64), T.ja.astype(np.int64)
    vals = T.a.astype(np.float64)
    level = np.zeros(m, dtype=np.int64)
    row_iter = range(m) if lower else range(m - 1, -1, -1)
    for i in row_iter:
        s, e = ia[i], ia[i + 1]
        nb = ja[s:e]
        nb = nb[nb < i] if lower else nb[nb > i]
        if nb.size:
            level[i] = level[nb].max() + 1
    n_levels = int(level.max()) + 1 if m else 1

    # group rows by level
    order = np.argsort(level, kind="stable")
    counts = np.bincount(level, minlength=n_levels)
    R = int(counts.max()) if m else 1
    lengths = T.row_lengths()
    offd = lengths - 1  # off-diagonal count per row (diag always present)
    W = max(int(offd.max()) if m else 0, 1)

    # the dense (n_levels, R, W) padding explodes on scattered matrices
    # with deep dependency chains (round-3: the scircuit twin's schedule
    # reached tens of GB and killed the remote worker mid-transfer) —
    # refuse with a clean error instead so harness retries log a failure
    pad_bytes = n_levels * R * (W + 1) * 8
    if pad_bytes > (1 << 31):
        raise ValueError(
            f"level schedule too padded ({pad_bytes / 1e9:.1f} GB: "
            f"{n_levels} levels x {R} rows x {W} width) — matrix needs a "
            "sparse-level trisolve formulation")

    rows_arr = np.full((n_levels, R), m, dtype=INDEX_DTYPE)
    cols_arr = np.zeros((n_levels, R, W), dtype=INDEX_DTYPE)
    vals_arr = np.zeros((n_levels, R, W), dtype=np.float64)
    invd_arr = np.zeros((n_levels, R), dtype=np.float64)
    fill = np.zeros(n_levels, dtype=np.int64)
    for i in order:
        lv = level[i]
        r = fill[lv]
        fill[lv] += 1
        rows_arr[lv, r] = i
        s, e = ia[i], ia[i + 1]
        w = 0
        diag = None
        for idx in range(s, e):
            j = ja[idx]
            if j == i:
                diag = vals[idx]
            else:
                cols_arr[lv, r, w] = j
                vals_arr[lv, r, w] = vals[idx]
                w += 1
        if diag is None or diag == 0.0:
            raise ValueError(f"missing/zero diagonal at row {i}")
        invd_arr[lv, r] = 1.0 / diag

    return LevelSchedule(
        rows=jnp.asarray(rows_arr),
        cols=jnp.asarray(cols_arr),
        vals=jnp.asarray(vals_arr.astype(np.dtype(dtype))),
        inv_diag=jnp.asarray(invd_arr.astype(np.dtype(dtype))),
        n_levels=n_levels,
        m=m,
        lower=lower,
    )


def sptrsv(sched: LevelSchedule, b: jnp.ndarray) -> jnp.ndarray:
    """Solve T x = b via the level schedule (device; one scan over levels)."""
    m = sched.m
    b = jnp.asarray(b, sched.vals.dtype)
    x0 = jnp.zeros(m + 1, dtype=b.dtype)  # slot m = padding sink
    bp = jnp.pad(b, (0, 1))

    def step(x, lvl):
        rows, cols, vals, invd = lvl
        gathered = jnp.take(x, cols)                     # (R, W)
        acc = jnp.sum(vals * gathered, axis=1)           # (R,)
        xi = (jnp.take(bp, rows) - acc) * invd
        x = x.at[rows].set(jnp.where(rows < m, xi, x[rows]))
        return x, None

    x, _ = jax.lax.scan(step, x0,
                        (sched.rows, sched.cols, sched.vals, sched.inv_diag))
    return x[:m]


def ilu0_solve(L_sched: LevelSchedule, U_sched: LevelSchedule,
               b: jnp.ndarray) -> jnp.ndarray:
    """x = U⁻¹ L⁻¹ b — the ILU0 preconditioner application."""
    y = sptrsv(L_sched, b)
    return sptrsv(U_sched, y)
