#!/usr/bin/env python
"""SELLRX packing sim v2: static bin->chunk assignment + overflow chain,
with per-constraint failure accounting at the home chunk.

Also sweeps design relaxations:
  * ncell: placement cells per (y2d%8, lane) target (1 = single src plane,
    2 = second placement plane in word2);
  * neidx: part-ends per (sublane, target lane) (1 or 2);
  * numap: window-rows per (sublane, src lane) (1 or 2 -> dual u-plane pick).
"""
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")

from spmv_research_tpu.gen import generate_from_line  # noqa: E402

SUB, LANES = 8, 128
GROUP_ROWS = 8192


class Chunk:
    __slots__ = ("wslot_of", "nwin", "pos", "umap", "eidx_cnt",
                 "cell_cnt", "nslots", "ncell", "neidx", "numap",
                 "nwin_cap")

    def __init__(self, ncell, neidx, numap):
        self.wslot_of = {}
        self.nwin = 0
        self.pos = [0] * SUB
        self.umap = [defaultdict(list) for _ in range(SUB)]
        self.eidx_cnt = [defaultdict(int) for _ in range(SUB)]
        self.cell_cnt = defaultdict(int)
        self.nslots = 0
        self.ncell, self.neidx, self.numap = ncell, neidx, numap

    def why_fail(self, xrow, lanes, tcell, tlane):
        if xrow not in self.wslot_of and self.nwin >= SUB:
            return "win"
        if self.cell_cnt[tcell] >= self.ncell:
            return "cell"
        k = len(lanes)
        any_space = any_tl = any_um = False
        for s in range(SUB):
            if self.pos[s] + k > LANES:
                continue
            any_space = True
            if self.eidx_cnt[s][tlane] >= self.neidx:
                continue
            any_tl = True
            u = self.wslot_of.get(xrow, self.nwin)
            um = self.umap[s]
            if any(len(um[c]) >= self.numap and u not in um[c]
                   for c in lanes):
                continue
            any_um = True
            return None  # placeable
        if not any_space:
            return "space"
        if not any_tl:
            return "tlane"
        return "umap"

    def place(self, xrow, lanes, tcell, tlane):
        if self.why_fail(xrow, lanes, tcell, tlane) is not None:
            return False
        k = len(lanes)
        u = self.wslot_of.get(xrow)
        if u is None:
            u = self.nwin
            self.wslot_of[xrow] = u
            self.nwin += 1
        for s in range(SUB):
            if self.pos[s] + k > LANES:
                continue
            if self.eidx_cnt[s][tlane] >= self.neidx:
                continue
            um = self.umap[s]
            if any(len(um[c]) >= self.numap and u not in um[c]
                   for c in lanes):
                continue
            for c in lanes:
                if u not in um[c]:
                    um[c].append(u)
            self.pos[s] += k
            self.eidx_cnt[s][tlane] += 1
            self.cell_cnt[tcell] += 1
            self.nslots += k
            return True
        return False


def run(host, ncell, neidx, numap, bins_per_chunk=8):
    m, nnz = host.m, host.nnz
    ia = host.ia.astype(np.int64)
    ja = host.ja.astype(np.int64)
    ngroups = (m + GROUP_ROWS - 1) // GROUP_ROWS
    tot_chunks = 0
    fails = defaultdict(int)
    for g in range(ngroups):
        r0, r1 = g * GROUP_ROWS, min((g + 1) * GROUP_ROWS, m)
        e0, e1 = int(ia[r0]), int(ia[r1])
        if e0 == e1:
            continue
        cols = ja[e0:e1]
        lens = (ia[r0 + 1:r1 + 1] - ia[r0:r1])
        rowl = np.repeat(np.arange(r1 - r0, dtype=np.int64), lens)
        xrow = cols >> 7
        lane = (cols & 127)
        brk = np.flatnonzero(np.r_[True, (np.diff(rowl) != 0)
                                   | (np.diff(xrow) != 0)])
        pend = np.append(brk[1:], cols.size)
        plen = pend - brk
        # static assignment: bins (unique xrows) -> chunks, 8 per chunk,
        # greedy size balance (sort bins by size desc, fill chunks to ~1024)
        uxr, binsz = np.unique(xrow[brk], return_counts=True)
        binsz_slots = np.zeros_like(binsz)
        for i, x in enumerate(uxr):
            binsz_slots[i] = plen[xrow[brk] == x].sum()
        order_b = np.argsort(-binsz_slots)
        home = {}
        chunks = []
        cur = None
        cur_load = 0
        cur_nw = 0
        for bi in order_b:
            if cur is None or cur_nw >= bins_per_chunk or \
                    cur_load + binsz_slots[bi] > 980:
                cur = Chunk(ncell, neidx, numap)
                chunks.append(cur)
                cur_load = 0
                cur_nw = 0
            home[int(uxr[bi])] = cur
            cur_load += binsz_slots[bi]
            cur_nw += 1
        overflow = []
        # place parts, longest first within bin order
        order = np.lexsort((-plen, xrow[brk]))
        for t in order:
            p, e = int(brk[t]), int(pend[t])
            while e - p > 0:
                k = min(e - p, LANES)
                xr = int(xrow[p])
                r = int(rowl[p])
                tcell = ((r >> 7) % SUB, r & 127)
                lns = lane[p:p + k].tolist()
                hc = home[xr]
                if not hc.place(xr, lns, tcell, r & 127):
                    fails[hc.why_fail(xr, lns, tcell, r & 127)] += 1
                    done = False
                    for oc in overflow[-6:]:
                        if oc.place(xr, lns, tcell, r & 127):
                            done = True
                            break
                    if not done:
                        oc = Chunk(ncell, neidx, numap)
                        overflow.append(oc)
                        oc.place(xr, lns, tcell, r & 127)
                p += k
        tot_chunks += len(chunks) + len(overflow)
    alloc = tot_chunks * SUB * LANES
    print(f"  ncell={ncell} neidx={neidx} numap={numap}: "
          f"chunks={tot_chunks} slots/nnz={alloc/nnz:.2f} "
          f"home-fails={dict(fails)}")
    return alloc / nnz


def main():
    line = ("170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 "
            "scircuit_twin")
    host, _ = generate_from_line(line)
    print(f"m={host.m} nnz={host.nnz}")
    for (nc, ne, nu) in [(1, 1, 1), (2, 1, 1), (1, 2, 1), (1, 1, 2),
                         (2, 2, 1), (2, 2, 2)]:
        t0 = time.time()
        run(host, nc, ne, nu)
        print(f"    ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()


def run_overflow(host, ncell, load_cap=980):
    """Like run(), but failed parts go through set-cover overflow chunks;
    reports final slots/nnz."""
    m, nnz = host.m, host.nnz
    ia = host.ia.astype(np.int64)
    ja = host.ja.astype(np.int64)
    ngroups = (m + GROUP_ROWS - 1) // GROUP_ROWS
    tot_chunks = 0
    tot_over = 0
    over_slots = 0
    for g in range(ngroups):
        r0, r1 = g * GROUP_ROWS, min((g + 1) * GROUP_ROWS, m)
        e0, e1 = int(ia[r0]), int(ia[r1])
        if e0 == e1:
            continue
        cols = ja[e0:e1]
        lens = (ia[r0 + 1:r1 + 1] - ia[r0:r1])
        rowl = np.repeat(np.arange(r1 - r0, dtype=np.int64), lens)
        xrow = cols >> 7
        lane = (cols & 127)
        brk = np.flatnonzero(np.r_[True, (np.diff(rowl) != 0)
                                   | (np.diff(xrow) != 0)])
        pend = np.append(brk[1:], cols.size)
        plen = pend - brk
        uxr, binsz = np.unique(xrow[brk], return_counts=True)
        binsz_slots = np.zeros_like(binsz)
        xr_of_part = xrow[brk]
        for i, x in enumerate(uxr):
            binsz_slots[i] = plen[xr_of_part == x].sum()
        order_b = np.argsort(-binsz_slots)
        home = {}
        chunks = []
        cur, cur_load, cur_nw = None, 0, 0
        for bi in order_b:
            if cur is None or cur_nw >= 8 or \
                    cur_load + binsz_slots[bi] > load_cap:
                cur = Chunk(ncell, 1, 1)
                chunks.append(cur)
                cur_load, cur_nw = 0, 0
            home[int(uxr[bi])] = cur
            cur_load += binsz_slots[bi]
            cur_nw += 1
        failed = []   # (xrow, lanes, tcell, tlane, k)
        order = np.lexsort((-plen, xr_of_part))
        for t in order:
            p, e = int(brk[t]), int(pend[t])
            while e - p > 0:
                k = min(e - p, 8)
                xr = int(xrow[p])
                r = int(rowl[p])
                tcell = ((r >> 7) % SUB, r & 127)
                lns = lane[p:p + k].tolist()
                if not home[xr].place(xr, lns, tcell, r & 127):
                    failed.append((xr, lns, tcell, r & 127, k))
                p += k
        # set-cover overflow: greedily open chunks on the 8 hottest xrows
        over = []
        while failed:
            cnt = defaultdict(int)
            for xr, lns, tc, tl, k in failed:
                cnt[xr] += k
            hot = set(sorted(cnt, key=lambda x: -cnt[x])[:8])
            oc = Chunk(ncell, 1, 1)
            over.append(oc)
            rest = []
            for xr, lns, tc, tl, k in failed:
                if xr not in hot or not oc.place(xr, lns, tc, tl):
                    rest.append((xr, lns, tc, tl, k))
            if len(rest) == len(failed):
                # nothing placed (pathological); place one by force count
                rest = rest[1:]
            failed = rest
        tot_chunks += len(chunks)
        tot_over += len(over)
        over_slots += sum(c.nslots for c in over)
    alloc = (tot_chunks + tot_over) * SUB * LANES
    print(f"  ncell={ncell} cap={load_cap}: home={tot_chunks} "
          f"over={tot_over} (slots {over_slots}) "
          f"slots/nnz={alloc/nnz:.3f}")
    return alloc / nnz


def main2():
    line = ("170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 "
            "scircuit_twin")
    host, _ = generate_from_line(line)
    print(f"m={host.m} nnz={host.nnz}")
    for nc, cap in [(2, 980), (2, 920), (3, 980), (3, 1010)]:
        t0 = time.time()
        run_overflow(host, nc, cap)
        print(f"    ({time.time()-t0:.1f}s)")


def run_W(host, W, ncell, load_cap=980, lookahead=6):
    """W windows per chunk (u = 5 bits, k picks of 8 + select)."""
    m, nnz = host.m, host.nnz
    ia = host.ia.astype(np.int64)
    ja = host.ja.astype(np.int64)
    ngroups = (m + GROUP_ROWS - 1) // GROUP_ROWS
    tot_home = tot_over = 0
    home_fails = defaultdict(int)
    for g in range(ngroups):
        r0, r1 = g * GROUP_ROWS, min((g + 1) * GROUP_ROWS, m)
        e0, e1 = int(ia[r0]), int(ia[r1])
        if e0 == e1:
            continue
        cols = ja[e0:e1]
        lens = (ia[r0 + 1:r1 + 1] - ia[r0:r1])
        rowl = np.repeat(np.arange(r1 - r0, dtype=np.int64), lens)
        xrow = cols >> 7
        lane = (cols & 127)
        brk = np.flatnonzero(np.r_[True, (np.diff(rowl) != 0)
                                   | (np.diff(xrow) != 0)])
        pend = np.append(brk[1:], cols.size)
        plen = pend - brk
        xr_of_part = xrow[brk]
        uxr, first = np.unique(xr_of_part, return_index=True)
        binsz_slots = np.bincount(
            np.searchsorted(uxr, xr_of_part), weights=plen).astype(np.int64)
        order_b = np.argsort(-binsz_slots)
        home = {}
        chunks = []
        cur, cur_load, cur_nw = None, 0, 0
        for bi in order_b:
            if cur is None or cur_nw >= W or \
                    cur_load + binsz_slots[bi] > load_cap:
                cur = Chunk(ncell, 1, 1)
                cur.nwin_cap = W
                chunks.append(cur)
                cur_load, cur_nw = 0, 0
            home[int(uxr[bi])] = cur
            cur_load += binsz_slots[bi]
            cur_nw += 1
        failed = []
        order = np.lexsort((-plen, xr_of_part))
        for t in order:
            p, e = int(brk[t]), int(pend[t])
            while e - p > 0:
                k = min(e - p, 8)
                xr = int(xrow[p])
                r = int(rowl[p])
                tcell = ((r >> 7) % SUB, r & 127)
                lns = lane[p:p + k].tolist()
                hc = home[xr]
                if not hc.place(xr, lns, tcell, r & 127):
                    home_fails[hc.why_fail(xr, lns, tcell, r & 127)] += 1
                    failed.append((xr, lns, tcell, r & 127))
                p += k
        over = []
        guard_iter = 0
        while failed and guard_iter < 400:
            guard_iter += 1
            cnt = defaultdict(int)
            for xr, lns, tc, tl in failed:
                cnt[xr] += len(lns)
            hot = set(sorted(cnt, key=lambda x: -cnt[x])[:W])
            oc = Chunk(ncell, 1, 1)
            oc.nwin_cap = W
            over.append(oc)
            rest = []
            for xr, lns, tc, tl in failed:
                if xr not in hot or not oc.place(xr, lns, tc, tl):
                    rest.append((xr, lns, tc, tl))
            if len(rest) == len(failed):
                rest = rest[1:]
            failed = rest
        tot_home += len(chunks)
        tot_over += len(over)
    alloc = (tot_home + tot_over) * SUB * LANES
    print(f"  W={W} ncell={ncell} cap={load_cap}: home={tot_home} "
          f"over={tot_over} slots/nnz={alloc/nnz:.3f} "
          f"fails={dict(home_fails)}")
    return alloc / nnz


# patch Chunk to honor per-instance window cap
_orig_why = Chunk.why_fail
def _why(self, xrow, lanes, tcell, tlane):
    cap = getattr(self, "nwin_cap", SUB)
    if xrow not in self.wslot_of and self.nwin >= cap:
        return "win"
    if self.cell_cnt[tcell] >= self.ncell:
        return "cell"
    k = len(lanes)
    any_space = any_tl = False
    for s in range(SUB):
        if self.pos[s] + k > LANES:
            continue
        any_space = True
        if self.eidx_cnt[s][tlane] >= self.neidx:
            continue
        any_tl = True
        u = self.wslot_of.get(xrow, self.nwin)
        um = self.umap[s]
        if any(len(um[c]) >= self.numap and u not in um[c] for c in lanes):
            continue
        return None
    if not any_space:
        return "space"
    if not any_tl:
        return "tlane"
    return "umap"
Chunk.why_fail = _why


def main3():
    line = ("170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 "
            "scircuit_twin")
    host, _ = generate_from_line(line)
    print(f"m={host.m} nnz={host.nnz}")
    for W, nc, cap in [(16, 2, 980), (24, 2, 980), (32, 2, 980),
                       (24, 3, 980), (32, 3, 1010), (32, 2, 900)]:
        t0 = time.time()
        run_W(host, W, nc, cap)
        print(f"    ({time.time()-t0:.1f}s)")
