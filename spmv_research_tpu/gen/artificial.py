"""Seeded artificial sparse-matrix generator.

Reimplements the reference's ``artificial_matrix_generation`` (the
``artificial-matrix-generator`` submodule; interface recovered from its call
site ``benchmark_code/BENCH/src/bench.cpp:250-252,569-579``, parameter
semantics from ``README.md:7-19``, and the older Python implementation at
``benchmark_code/FPGA/csr_to_vitis_converter/v2/artificial_matrix_generation.py``).

The 11 positional parameters (one line of a
``matrix_generation_parameters/*.txt`` file):

    nr_rows nr_cols avg_nnz_per_row std_nnz_per_row distribution placement
    bw skew avg_num_neighbours cross_row_similarity seed

* ``distribution``: "normal" or "gamma" — per-row nnz count sampled from
  N(avg, std) or Gamma(shape=avg²/std², scale=std²/avg); negatives mirrored
  to positive (reference integerization: ``int(x) if x>0 else int(-x)``).
* ``placement``: "random" (uniform within the bandwidth window around the
  scaled diagonal), "diagonal" (optionally "diagonal_<d_f>": a band of width
  ``row_nnz/d_f`` around the diagonal), "simple" (consecutive columns from
  the diagonal).
* ``bw`` ∈ (0,1]: bandwidth window size as a fraction of nr_cols.
* ``skew``: target ``(max_nnz_row − avg) / avg`` (the measured-skew definition
  of ``csr_matrix_features_validation`` — ``csr_util_gen.c:1115``); realized by
  boosting a small number of heavy rows.
* ``avg_num_neighbours``: target mean per-nnz count of same-row nonzeros at
  column distance ≤ 1; realized by placing nonzeros in runs of expected length
  ``r = 2/(2−t)``.
* ``cross_row_similarity``: target fraction of a row's nonzeros with a column
  match (|Δcol| ≤ 1) in the next non-empty row; realized by copying that
  fraction of column positions from the previous row.
* ``seed``: all sampling uses ``np.random.Generator(np.random.PCG64(seed))``
  so matrices are reproducible across platforms (reference ``README.md:14``).

Determinism: same (params, seed) → identical matrix on every platform.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..core.host import HostCSR, INDEX_DTYPE
from ..convert.features import MatrixFeatures, extract_features


@dataclasses.dataclass
class ArtificialParams:
    nr_rows: int
    nr_cols: int
    avg_nnz_per_row: float
    std_nnz_per_row: float
    distribution: str = "normal"  # normal | gamma
    placement: str = "random"  # random | diagonal[_d_f] | simple
    bw: float = 1.0  # bandwidth fraction of nr_cols
    skew: float = 0.0
    avg_num_neighbours: float = 0.0
    cross_row_similarity: float = 0.0
    seed: int = 14
    name: Optional[str] = None

    @staticmethod
    def from_args(args) -> "ArtificialParams":
        """Parse the 11(+1 optional name) positional benchmark arguments
        (``bench.cpp:566-586`` / one line of a parameter sweep file)."""
        a = list(args)
        return ArtificialParams(
            nr_rows=int(a[0]),
            nr_cols=int(a[1]),
            avg_nnz_per_row=float(a[2]),
            std_nnz_per_row=float(a[3]),
            distribution=str(a[4]),
            placement=str(a[5]),
            bw=float(a[6]),
            skew=float(a[7]),
            avg_num_neighbours=float(a[8]),
            cross_row_similarity=float(a[9]),
            seed=int(float(a[10])),
            name=str(a[11]) if len(a) > 11 else None,
        )


def _sample_row_lengths(p: ArtificialParams, rng: np.random.Generator) -> np.ndarray:
    avg, std = p.avg_nnz_per_row, max(p.std_nnz_per_row, 1e-12)
    if p.distribution == "normal":
        snd = rng.normal(loc=avg, scale=std, size=p.nr_rows)
    elif p.distribution == "gamma":
        snd = rng.gamma(shape=(avg * avg) / (std * std), scale=(std * std) / avg,
                        size=p.nr_rows)
    else:
        raise ValueError(f"unknown distribution {p.distribution!r}")
    lengths = np.abs(snd).astype(np.int64)  # reference integerization (mirror negatives)
    np.minimum(lengths, p.nr_cols, out=lengths)

    target_max = int(round(avg * (1.0 + max(p.skew, 0.0))))
    target_max = min(max(target_max, 1), p.nr_cols)

    # Heavy-tailed twins (std ≫ avg, large skew — power-law matrices like
    # webbase/ASIC_680k/mawi): |N(avg, std)| has mean ≈ std·√(2/π) ≫ avg, so
    # direct sampling misses the requested avg by an order of magnitude.
    # Two-component model instead: light rows ~ |N(μ_l, μ_l/2)| plus a few
    # geometrically decaying heavy rows sized so the realized second moment
    # matches m·std² and the realized max hits avg·(1+skew) — reproducing
    # exactly the features (nnz-r-avg/std/skew, csr_util_gen.c:1044-1115)
    # the twin parameters were measured from.
    if std > 1.5 * avg and p.skew > 10 and target_max > 4 * avg and p.nr_rows > 1:
        V = p.nr_rows * std * std
        rho = 0.8
        lvl_f = target_max * rho ** np.arange(64, dtype=np.float64)
        lvl_f = lvl_f[lvl_f >= max(2.0 * avg, 2.0)]
        if lvl_f.size == 0:
            lvl_f = np.array([float(target_max)])
        tot_sq = float(np.sum(lvl_f * lvl_f))
        if tot_sq < V:   # max is capped (e.g. at nr_cols): need several rows
            mult = min(int(np.ceil(V / tot_sq)), max(p.nr_rows // 128, 1))
            lvl_f = np.repeat(lvl_f, mult)
            lvl_f[::-1].sort()
        h = int(np.searchsorted(np.cumsum(lvl_f * lvl_f), V)) + 1
        h = min(h, lvl_f.size, max(p.nr_rows // 20, 1))
        # heavy mass must leave the light component a positive mean
        h_mass = int(np.searchsorted(np.cumsum(lvl_f[:h]),
                                     0.9 * avg * p.nr_rows))
        h = max(min(h, max(h_mass, 1)), 1)
        heavy = np.round(lvl_f[:h]).astype(np.int64)
        mu_l = max(avg - heavy.sum() / p.nr_rows, 0.05 * avg)
        lengths = np.abs(
            rng.normal(loc=mu_l, scale=mu_l / 2.0, size=p.nr_rows)
        ).astype(np.int64)
        np.minimum(lengths, p.nr_cols, out=lengths)
        heavy_rows = rng.choice(p.nr_rows, size=h, replace=False)
        lengths[heavy_rows] = heavy
        return lengths

    # Moderate skew shaping: make max row length ≈ avg*(1+skew) in BOTH
    # directions — clip the natural tail when it overshoots the target, boost
    # heavy rows when it undershoots (a small tail either way, so avg shifts
    # negligibly).
    if p.skew > 0 and p.nr_rows > 0:
        np.minimum(lengths, target_max, out=lengths)
        cur_max = int(lengths.max()) if lengths.size else 0
        if target_max > cur_max:
            n_heavy = max(1, p.nr_rows // 10000)
            heavy_rows = rng.choice(p.nr_rows, size=n_heavy, replace=False)
            # heaviest row hits the target; others geometrically decay toward avg
            scale = np.geomspace(1.0, max(avg, 1.0) / target_max, n_heavy)
            lengths[heavy_rows] = np.maximum(
                lengths[heavy_rows], (target_max * scale).astype(np.int64)
            )
    return lengths


def _window_bounds(p: ArtificialParams, lengths: np.ndarray):
    """Per-row column window [w0, w1) within which nonzeros are placed."""
    m, n = p.nr_rows, p.nr_cols
    rows = np.arange(m, dtype=np.float64)
    diag = rows * (n / max(m, 1))  # scaled diagonal anchor
    placement = p.placement
    d_f = 0.5
    if placement.startswith("diagonal_"):
        d_f = float(placement.split("_", 1)[1])
        placement = "diagonal"
    if placement == "diagonal":
        # band of width row_nnz/d_f around the diagonal (python reference :75-82)
        half = np.maximum(lengths / max(d_f, 1e-6), lengths)
        w0 = np.floor(diag - half)
        w1 = np.ceil(diag + half) + 1
    elif placement == "simple":
        w0 = np.floor(diag)
        w1 = w0 + np.maximum(lengths, 1)
    else:  # random within bandwidth window
        # measured bandwidth = mean over rows of (cmax−cmin)/n, and g run
        # starts drawn uniformly in a window of size W have expected span
        # W·(g−1)/(g+1) — inflate the window so the *measured* bw hits the
        # requested value (rows with a single run cannot span a window)
        t = min(max(p.avg_num_neighbours, 0.0), 1.98)
        run_len = 2.0 / (2.0 - t)
        g = np.maximum(np.round(lengths / run_len), 1.0)
        inflate = np.where(g >= 2, (g + 1.0) / np.maximum(g - 1.0, 1.0), 1.0)
        W = np.maximum(np.round(p.bw * n * inflate),
                       np.maximum(lengths, 1).astype(np.float64))
        w0 = np.round(diag - W / 2.0)
        w1 = w0 + W
    # clip to [0, n), keeping window size where possible
    w0 = np.clip(w0, 0, None)
    shift = np.clip(w1 - n, 0, None)
    w0 = np.clip(w0 - shift, 0, None)
    w1 = np.clip(w1, None, n)
    return w0.astype(np.int64), w1.astype(np.int64)


def _place_columns(p: ArtificialParams, lengths: np.ndarray,
                   rng: np.random.Generator) -> np.ndarray:
    """Generate sorted, unique column indices per row, concatenated (CSR order).

    Nonzeros are laid out in runs of consecutive columns (expected run length
    r = 2/(2−t) for neighbour target t), with run starts uniform in the row's
    bandwidth window; a fraction `cross_row_similarity` of positions is copied
    from the previous row.
    """
    m, n = p.nr_rows, p.nr_cols
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=INDEX_DTYPE)

    w0, w1 = _window_bounds(p, lengths)
    wsize = np.maximum(w1 - w0, 1)

    t = min(max(p.avg_num_neighbours, 0.0), 1.98)
    run_len = 2.0 / (2.0 - t)  # expected run length for neighbour target

    nruns = np.maximum(np.round(lengths / run_len).astype(np.int64), 1)
    nruns = np.minimum(nruns, np.maximum(lengths, 1))

    # split k_i nonzeros into g_i runs: base length + remainder on first runs
    base = lengths // nruns
    rem = lengths - base * nruns

    # per-run arrays
    runs_per_row = nruns
    total_runs = int(runs_per_row.sum())
    run_row = np.repeat(np.arange(m), runs_per_row)
    run_rank = np.arange(total_runs) - np.repeat(
        np.cumsum(runs_per_row) - runs_per_row, runs_per_row
    )
    run_lengths = base[run_row] + (run_rank < rem[run_row]).astype(np.int64)

    # run starts: uniform in window (leave room for the run)
    u = rng.random(total_runs)
    span = np.maximum(wsize[run_row] - run_lengths, 1)
    run_starts = w0[run_row] + np.floor(u * span).astype(np.int64)

    # expand runs to per-nnz columns
    nnz_run = np.repeat(np.arange(total_runs), run_lengths)
    offs = np.arange(total) - np.repeat(
        np.cumsum(run_lengths) - run_lengths, run_lengths
    )
    cols = run_starts[nnz_run] + offs

    # cross-row similarity: rows in blocks of `block_len` consecutive rows share
    # a template — each row copies its first ⌈s·k⌉ column positions from the
    # block-head row's base pattern, so adjacent rows share those columns and
    # the measured next-non-empty-row similarity ≈ s.
    s = min(max(p.cross_row_similarity, 0.0), 1.0)
    row_of = np.repeat(np.arange(m), lengths)
    if s > 0 and m > 1:
        block_len = 16
        starts = np.concatenate([[0], np.cumsum(lengths)])
        head = (np.arange(m) // block_len) * block_len
        ncopy = np.ceil(s * lengths).astype(np.int64)
        ncopy = np.minimum(ncopy, lengths[head])  # can't copy more than head has
        pos_in_row = np.arange(total) - starts[row_of]
        copy_mask = (pos_in_row < ncopy[row_of]) & (row_of != head[row_of])
        src = starts[head[row_of]] + pos_in_row
        cols = np.where(copy_mask, cols[np.clip(src, 0, total - 1)], cols)

    # clamp to window, sort within rows, enforce uniqueness by forward pushes
    cols = np.clip(cols, 0, n - 1)
    order = np.lexsort((cols, row_of))
    cols = cols[order]
    cols = _dedupe_sorted_rows(cols, lengths, n)
    return cols.astype(INDEX_DTYPE)


def _dedupe_sorted_rows(cols: np.ndarray, lengths: np.ndarray, n: int) -> np.ndarray:
    """Make per-row sorted column lists strictly increasing: duplicates are pushed
    forward by +1 (cascading), then rows overflowing n are pushed backward.

    Closed form of the push fixpoints (O(total), one pass each way):
    forward   r_p = p + max_{q≤p}(c_q − q)       (segmented running max);
    backward  r'_p = min(r_p, n − len + p)       (r strictly increasing makes
    every intermediate backward term slack except the row-end cap, and the min
    of two strictly increasing sequences stays strictly increasing)."""
    total = cols.size
    if total == 0:
        return cols
    live = lengths > 0
    row_of = np.repeat(np.arange(lengths.size)[live], lengths[live])
    starts = np.cumsum(lengths) - lengths
    pos = np.arange(total) - starts[row_of]
    # segmented running max of (c - pos) via a per-row monotone offset
    base = np.int64(n + 2)
    d = (cols.astype(np.int64) - pos) + row_of * base
    np.maximum.accumulate(d, out=d)
    r = (d - row_of * base) + pos
    # backward overflow cap (rows longer than n were clipped upstream)
    np.minimum(r, (np.int64(n) - lengths[row_of]) + pos, out=r)
    return r


def artificial_matrix_generation(params: ArtificialParams) -> tuple[HostCSR, MatrixFeatures]:
    """Generate a seeded synthetic CSR matrix plus its measured features
    (the reference returns ``struct csr_matrix`` carrying the same stats —
    ``bench_spmv.cpp:531-552``)."""
    rng = np.random.Generator(np.random.PCG64(params.seed))
    lengths = _sample_row_lengths(params, rng)
    cols = _place_columns(params, lengths, rng)
    # after dedupe, rows are strictly increasing; lengths unchanged
    ia = np.zeros(params.nr_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=ia[1:])
    vals = rng.uniform(0.01, 1.0, size=cols.size)
    csr = HostCSR(
        a=vals,
        ia=ia.astype(INDEX_DTYPE),
        ja=cols,
        m=params.nr_rows,
        n=params.nr_cols,
    )
    feats = extract_features(csr)
    return csr, feats


def generate_from_line(line: str) -> tuple[HostCSR, MatrixFeatures]:
    """Generate from one whitespace-separated parameter-file line
    (``matrix_generation_parameters/*.txt`` format)."""
    return artificial_matrix_generation(ArtificialParams.from_args(line.split()))
