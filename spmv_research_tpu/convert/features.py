"""Matrix structural-feature extraction.

Vectorized numpy reimplementation of the reference's feature pipeline
(``lib/storage_formats/csr_util/csr_util_gen.c``):

* ``csr_degrees_bandwidths_scatters`` (``:408``): per-row degree; per-row
  bandwidth = ``col_max - col_min`` (0 for empty rows); per-row scatter =
  ``degree / bandwidth`` (0 when bandwidth is 0).
* ``csr_row_neighbours`` (``:597``): per-nnz count of same-row nonzeros within
  column distance ``window_size`` (counted symmetrically in both directions).
* ``csr_cross_row_similarity`` (``:640``): per non-empty row, the fraction of
  its nonzeros that have a column match (|Δcol| ≤ window) in the *next
  non-empty* row; averaged over non-empty rows (the last non-empty row
  contributes 0).
* ``csr_matrix_features_validation`` (``:1044``): the 11-parameter "twin" tuple
  — m n avg_nnz std_nnz distribution placement bw_scaled skew neigh_avg
  cross_row_sim seed — with ``skew = (max_nnz_row − avg) / avg`` and
  window_size = 1.

These are the 23 structural columns the synthetic-matrix CSV schema reports
(``bench_spmv.cpp:491-563``) and the generator's calibration targets.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core.host import HostCSR


@dataclasses.dataclass
class MatrixFeatures:
    m: int
    n: int
    nnz: int
    density: float
    mem_footprint_mb: float
    mem_range: str
    nnz_per_row_min: float
    nnz_per_row_max: float
    nnz_per_row_avg: float
    nnz_per_row_std: float
    bw_avg: float          # mean per-row bandwidth (absolute columns)
    bw_std: float
    bw_scaled_avg: float   # bw / n
    bw_scaled_std: float
    scatter_avg: float
    scatter_std: float
    scatter_scaled_avg: float
    scatter_scaled_std: float
    skew: float
    num_neighbours_avg: float
    cross_row_similarity_avg: float

    def twin_params(self, distribution="normal", placement="random", seed=14):
        """The 11 positional generator arguments for this matrix's synthetic twin
        (format of ``matrix_generation_parameters/*.txt`` lines and
        ``csr_matrix_features_validation``'s stderr output)."""
        return (
            self.m,
            self.n,
            self.nnz_per_row_avg,
            self.nnz_per_row_std,
            distribution,
            placement,
            self.bw_scaled_avg,
            self.skew,
            self.num_neighbours_avg,
            self.cross_row_similarity_avg,
            seed,
        )


_MB_CLASSES = [4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096]


def mem_range_class(mem_mb: float) -> str:
    for lo, hi in zip(_MB_CLASSES[:-1], _MB_CLASSES[1:]):
        if lo <= mem_mb <= hi:
            return f"[{lo}-{hi}]"
    return "[<4]" if mem_mb < 4 else f"[>{_MB_CLASSES[-1]}]"


def degrees_bandwidths_scatters(csr: HostCSR):
    deg = csr.row_lengths().astype(np.float64)
    bw = np.zeros(csr.m, dtype=np.float64)
    sc = np.zeros(csr.m, dtype=np.float64)
    nonempty = deg > 0
    if csr.nnz:
        # columns are sorted within rows ⇒ min/max at row slice ends
        first = csr.ia[:-1][nonempty]
        last = csr.ia[1:][nonempty] - 1
        cmin = csr.ja[first]
        cmax = csr.ja[last]
        # guard against unsorted columns
        if np.any(cmin > cmax):
            rows = np.repeat(np.arange(csr.m), csr.row_lengths())
            cmin_full = np.full(csr.m, np.iinfo(np.int64).max)
            cmax_full = np.full(csr.m, -1)
            np.minimum.at(cmin_full, rows, csr.ja)
            np.maximum.at(cmax_full, rows, csr.ja)
            cmin, cmax = cmin_full[nonempty], cmax_full[nonempty]
        b = (cmax - cmin).astype(np.float64)
        bw[nonempty] = b
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(b > 0, deg[nonempty] / b, 0.0)
        sc[nonempty] = s
    return deg, bw, sc


def row_neighbours_avg(csr: HostCSR, window_size: int = 1) -> float:
    """Mean over nnz of same-row neighbor count within `window_size` columns."""
    if csr.nnz == 0:
        return 0.0
    from ..io import native as _native

    if _native.have_native():
        return _native.row_neighbours_avg_native(
            csr.ia, csr.ja, csr.m, csr.nnz, window_size)
    total = 0
    ja = csr.ja.astype(np.int64)
    lengths = csr.row_lengths()
    rows_split = np.cumsum(lengths)[:-1]
    # Count ordered pairs (j < k) in the same row with col[k]-col[j] <= w via two-pointer,
    # vectorized with searchsorted per row segment.
    row_of = np.repeat(np.arange(csr.m), lengths)
    # limit index for each j: first k in same row with col > col[j]+w
    # do it per row to keep searchsorted local
    ia = csr.ia
    for i in range(csr.m):
        s, e = int(ia[i]), int(ia[i + 1])
        if e - s < 2:
            continue
        seg = ja[s:e]
        hi = np.searchsorted(seg, seg + window_size, side="right")
        # pairs for j: hi[j] - (j+1); each pair contributes 2 neighbor counts
        total += 2 * int(np.sum(hi - np.arange(1, e - s + 1)))
    return total / csr.nnz


def cross_row_similarity_avg(csr: HostCSR, window_size: int = 1) -> float:
    from ..io import native as _native

    if _native.have_native():
        return _native.cross_row_similarity_avg_native(
            csr.ia, csr.ja, csr.m, window_size)
    deg = csr.row_lengths()
    nonempty = np.nonzero(deg > 0)[0]
    if nonempty.size == 0:
        return 0.0
    ja = csr.ja.astype(np.int64)
    ia = csr.ia
    total = 0.0
    for idx in range(nonempty.size - 1):
        i = nonempty[idx]
        l = nonempty[idx + 1]
        a = ja[ia[i] : ia[i + 1]]
        b = ja[ia[l] : ia[l + 1]]
        # match: exists col in b with |col - a_j| <= w  (both sorted)
        lo = np.searchsorted(b, a - window_size, side="left")
        hi = np.searchsorted(b, a + window_size, side="right")
        matches = int(np.count_nonzero(hi > lo))
        total += matches / a.size
    return total / nonempty.size


def extract_features(csr: HostCSR, value_bytes: int = 8, index_bytes: int = 4,
                     window_size: int = 1) -> MatrixFeatures:
    deg, bw, sc = degrees_bandwidths_scatters(csr)
    n = csr.n
    avg = csr.nnz / csr.m if csr.m else 0.0
    mem_mb = csr.mem_footprint_bytes(value_bytes, index_bytes) / (1024.0 * 1024.0)
    return MatrixFeatures(
        m=csr.m,
        n=csr.n,
        nnz=csr.nnz,
        density=csr.nnz / (csr.m * csr.n) * 100.0 if csr.m and csr.n else 0.0,
        mem_footprint_mb=mem_mb,
        mem_range=mem_range_class(mem_mb),
        nnz_per_row_min=float(deg.min()) if csr.m else 0.0,
        nnz_per_row_max=float(deg.max()) if csr.m else 0.0,
        nnz_per_row_avg=avg,
        nnz_per_row_std=float(deg.std()),
        bw_avg=float(bw.mean()),
        bw_std=float(bw.std()),
        bw_scaled_avg=float(bw.mean()) / n if n else 0.0,
        bw_scaled_std=float(bw.std()) / n if n else 0.0,
        scatter_avg=float(sc.mean()),
        scatter_std=float(sc.std()),
        scatter_scaled_avg=float(sc.mean()) / avg if avg else 0.0,
        scatter_scaled_std=float(sc.std()) / avg if avg else 0.0,
        skew=(float(deg.max()) - avg) / avg if avg else 0.0,
        num_neighbours_avg=row_neighbours_avg(csr, window_size),
        cross_row_similarity_avg=cross_row_similarity_avg(csr, window_size),
    )
