"""ctypes bindings for the native host library (native/sparse_host.cpp).

The framework works without the native library (pure numpy fallbacks
everywhere); when ``native/libsparse_host.so`` is present (``make -C
native``), the hot host-side paths — MTX parsing, COO→CSR, RCM, feature
extraction, Beneš routing — switch to C++ transparently.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_c_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_c_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_c_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_c_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_c_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_c_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", "libsparse_host.so"),
                 os.environ.get("SPARSE_HOST_LIB", "")):
        if cand and os.path.exists(cand):
            return cand
    return None


def _try_build() -> None:
    """Build libsparse_host.so from source if the checkout is fresh.

    The .so is a build artifact (not in git); without it every builder
    silently falls back to the numpy tiers — CLOSG cold conversion goes
    13.7 s -> ~75 s at 1M nnz. One `make -C native` fixes that, so try
    it once, quietly, when sources exist but the library doesn't."""
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    ndir = os.path.join(here, "native")
    if not os.path.exists(os.path.join(ndir, "Makefile")):
        return
    try:
        subprocess.run(["make", "-C", ndir], check=False, timeout=120,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except Exception:
        pass


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        _try_build()
        path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)

    lib.mtx_parse_body.restype = ctypes.c_int64
    lib.mtx_parse_body.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        _c_i32p, _c_i32p, _c_f64p]

    lib.coo_to_csr.restype = None
    lib.coo_to_csr.argtypes = [
        _c_i32p, _c_i32p, _c_f64p, ctypes.c_int64, ctypes.c_int64,
        _c_i32p, _c_i32p, _c_f64p]

    lib.rcm.restype = None
    lib.rcm.argtypes = [_c_i32p, _c_i32p, ctypes.c_int64, _c_i32p]

    lib.row_neighbours_avg.restype = ctypes.c_double
    lib.row_neighbours_avg.argtypes = [
        _c_i32p, _c_i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]

    lib.cross_row_similarity_avg.restype = ctypes.c_double
    lib.cross_row_similarity_avg.argtypes = [
        _c_i32p, _c_i32p, ctypes.c_int64, ctypes.c_int64]

    lib.waksman_route.restype = ctypes.c_int32
    lib.waksman_route.argtypes = [
        _c_i64p, _c_i64p, _c_u8p, ctypes.c_int64, ctypes.c_int32,
        _c_u32p, _c_u32p, _c_i32p]

    if hasattr(lib, "euler_edge_color"):  # stale .so: degrade politely
        lib.euler_edge_color.restype = ctypes.c_int32
        lib.euler_edge_color.argtypes = [
            _c_i64p, _c_i64p, ctypes.c_int64, ctypes.c_int32, _c_i32p]

    if hasattr(lib, "sellw_pack"):   # stale pre-SELLW .so: degrade politely
        lib.sellw_pack.restype = ctypes.c_int64
        lib.sellw_pack.argtypes = [
            _c_i64p, _c_i32p, _c_f32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, _c_i32p]

    if hasattr(lib, "sellw_pack2"):  # + part_cap (round-4 scan-depth cap)
        lib.sellw_pack2.restype = ctypes.c_int64
        lib.sellw_pack2.argtypes = [
            _c_i64p, _c_i32p, _c_f32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, _c_i32p, ctypes.c_void_p]

    _LIB = lib
    return _LIB


def have_native() -> bool:
    return get_lib() is not None


def mtx_parse_body(body: bytes, nnz_decl: int, fields: int):
    lib = get_lib()
    rows = np.empty(nnz_decl, np.int32)
    cols = np.empty(nnz_decl, np.int32)
    vals = np.empty(nnz_decl, np.float64)
    got = lib.mtx_parse_body(body, len(body), nnz_decl, fields,
                             rows, cols, vals)
    if got != nnz_decl:
        raise ValueError(f"native mtx parse: got {got} of {nnz_decl} entries")
    return rows, cols, vals


def coo_to_csr_native(rows, cols, vals, m):
    lib = get_lib()
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float64)
    nnz = rows.size
    ia = np.empty(m + 1, np.int32)
    ja = np.empty(nnz, np.int32)
    a = np.empty(nnz, np.float64)
    lib.coo_to_csr(rows, cols, vals, nnz, m, ia, ja, a)
    return ia, ja, a


def rcm_native(ia, ja, m):
    lib = get_lib()
    perm = np.empty(m, np.int32)
    lib.rcm(np.ascontiguousarray(ia, np.int32),
            np.ascontiguousarray(ja, np.int32), m, perm)
    return perm.astype(np.int64)


def row_neighbours_avg_native(ia, ja, m, nnz, window=1):
    lib = get_lib()
    return float(lib.row_neighbours_avg(
        np.ascontiguousarray(ia, np.int32),
        np.ascontiguousarray(ja, np.int32), m, nnz, window))


def cross_row_similarity_avg_native(ia, ja, m, window=1):
    lib = get_lib()
    return float(lib.cross_row_similarity_avg(
        np.ascontiguousarray(ia, np.int32),
        np.ascontiguousarray(ja, np.int32), m, window))


def waksman_route_native(s_full, t_full, real, N, L):
    """Returns (A_words (W,N) uint32, B_words, stage_ks list)."""
    lib = get_lib()
    max_stages = 2 * L
    n_words = (max_stages + 31) // 32
    A = np.zeros(n_words * N, np.uint32)
    B = np.zeros(n_words * N, np.uint32)
    ks = np.zeros(max_stages, np.int32)
    n = lib.waksman_route(
        np.ascontiguousarray(s_full, np.int64),
        np.ascontiguousarray(t_full, np.int64),
        np.ascontiguousarray(real, np.uint8), N, L, A, B, ks)
    used_words = max((n + 31) // 32, 1)
    # default-keep semantics: only the take-partner planes are used (the C++
    # router still records keep bits; they are dropped here — see
    # ops/waksman.py emit comment)
    return (np.zeros((0, N), np.uint32),
            B.reshape(n_words, N)[:used_words],
            [int(k) for k in ks[:n]])


def have_euler_edge_color() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "euler_edge_color")


def euler_edge_color_native(left, right, levels):
    """Returns per-edge colors, or None when the native guard declines
    (key space too large) — caller falls back to numpy."""
    lib = get_lib()
    left = np.ascontiguousarray(left, np.int64)
    right = np.ascontiguousarray(right, np.int64)
    color = np.empty(left.size, np.int32)
    rc = lib.euler_edge_color(left, right, left.size, levels, color)
    return color if rc == 0 else None


def have_sellw_pack(part_cap: int = 128) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    if part_cap < 128:
        return hasattr(lib, "sellw_pack2")
    return hasattr(lib, "sellw_pack")


def sellw_pack_native(ia, ja, a_f32, m, part_cap: int = 128,
                      want_idx: bool = False):
    """Two-pass native SELLW packer: count, allocate exact, pack.

    Returns (word (nchunks·8,128) int32, vals likewise float32,
    wrow (nchunks·8,), pair (nchunks,), bids (nchunks,) uint8, max_part
    [, idx (nchunks·8,128) int32 source-nnz per slot, -1 empty])."""
    lib = get_lib()
    ia = np.ascontiguousarray(ia, np.int64)
    ja = np.ascontiguousarray(ja, np.int32)
    a_f32 = np.ascontiguousarray(a_f32, np.float32)
    mp = np.zeros(1, np.int32)

    def call(cap, count_only, *bufs):
        if hasattr(lib, "sellw_pack2"):
            idx_buf = bufs[5] if len(bufs) > 5 else None
            return lib.sellw_pack2(ia, ja, a_f32, m, cap, count_only,
                                   part_cap, *bufs[:5], mp, idx_buf)
        assert part_cap >= 128 and not want_idx
        return lib.sellw_pack(ia, ja, a_f32, m, cap, count_only,
                              *bufs[:5], mp)

    n = call(0, 1, None, None, None, None, None)
    word = np.zeros((max(int(n), 1) * 8, 128), np.int32)
    vals = np.zeros((max(int(n), 1) * 8, 128), np.float32)
    wrow = np.zeros(max(int(n), 1) * 8, np.int32)
    pair = np.zeros(max(int(n), 1), np.int32)
    bids = np.zeros(max(int(n), 1), np.uint8)
    bufs = [word.ctypes.data_as(ctypes.c_void_p),
            vals.ctypes.data_as(ctypes.c_void_p),
            wrow.ctypes.data_as(ctypes.c_void_p),
            pair.ctypes.data_as(ctypes.c_void_p),
            bids.ctypes.data_as(ctypes.c_void_p)]
    if want_idx:
        idx = np.zeros((max(int(n), 1) * 8, 128), np.int32)
        bufs.append(idx.ctypes.data_as(ctypes.c_void_p))
    n2 = call(int(n), 0, *bufs)
    assert n2 == n, (n2, n)
    out = (word[: int(n) * 8], vals[: int(n) * 8], wrow[: int(n) * 8],
           pair[: int(n)], bids[: int(n)], int(mp[0]))
    if want_idx:
        return out + (idx[: int(n) * 8],)
    return out
