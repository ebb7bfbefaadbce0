#!/usr/bin/env python
"""Packing simulation for the SELLRX scattered engine (round-3 design).

Estimates achievable slots/nnz on the scircuit twin under the kernel
constraints (before writing the real builder):

  * group = 8192 rows (64 y2d rows); chunk = 8 sublanes x 128 lanes,
    per-sublane fill row (8 window rows per chunk, one per sublane);
  * gather: slot (s,l) reads wins[u[s, c], c] -> per (sublane, source
    lane) the window-row u is shared (conflict: same sublane, same
    source lane, different u);
  * eidx: per (sublane, target lane) one part end;
  * placement: per (chunk, target cell (y2d%8, r%128)) one part.

Greedy packer: bins (group x x2d-row) -> parts -> first-fit over open
chunks of the group with constraint checks; prints slots/nnz and
constraint-miss breakdown.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from spmv_research_tpu.gen import generate_from_line  # noqa: E402

SUB, LANES = 8, 128
GROUP_ROWS = 8192


class Chunk:
    __slots__ = ("wrows", "wslot_of", "pos", "umap", "taken_eidx",
                 "taken_cell", "nslots")

    def __init__(self):
        self.wrows = []            # x2d rows bound to sublanes (<=8)
        self.wslot_of = {}         # x2d row -> window slot (sublane idx u)
        self.pos = [0] * SUB       # fill position per sublane
        self.umap = [dict() for _ in range(SUB)]   # sublane -> {src_lane: u}
        self.taken_eidx = [0] * SUB  # bitmask of target lanes per sublane
        self.taken_cell = set()    # (y2d%8, lane) placement cells
        self.nslots = 0

    def try_place(self, xrow, lanes, tcell, tlane):
        """Part with columns `lanes` (within its x2d row), target cell
        (s_t, l_t). Returns sublane or -1, with reason code."""
        # window row
        if xrow in self.wslot_of:
            u = self.wslot_of[xrow]
        elif len(self.wrows) < SUB:
            u = None  # allocate on success
        else:
            return -1, "win"
        if tcell in self.taken_cell:
            return -1, "cell"
        k = len(lanes)
        for s in range(SUB):
            if self.pos[s] + k > LANES:
                continue
            if (self.taken_eidx[s] >> tlane) & 1:
                continue
            um = self.umap[s]
            uu = u if u is not None else len(self.wrows)
            if any(um.get(c, uu) != uu for c in lanes):
                continue
            # commit
            if u is None:
                u = len(self.wrows)
                self.wrows.append(xrow)
                self.wslot_of[xrow] = u
            for c in lanes:
                um[c] = u
            self.pos[s] += k
            self.taken_eidx[s] |= 1 << tlane
            self.taken_cell.add(tcell)
            self.nslots += k
            return s, "ok"
        return -1, "sub"


def main():
    line = ("170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 "
            "scircuit_twin")
    if len(sys.argv) > 1:
        line = sys.argv[1]
    host, feats = generate_from_line(line)
    m, n, nnz = host.m, host.n, host.nnz
    ia = host.ia.astype(np.int64)
    ja = host.ja.astype(np.int64)
    print(f"m={m} nnz={nnz}")

    ngroups = (m + GROUP_ROWS - 1) // GROUP_ROWS
    tot_chunks = 0
    tot_slots = 0
    miss = {"win": 0, "cell": 0, "sub": 0}
    spilled = 0
    t0 = time.time()
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
        # parts: runs of (row, xrow), split at LANES
        brk = np.flatnonzero(np.r_[True, (np.diff(rowl) != 0)
                                   | (np.diff(xrow) != 0)])
        pend = np.append(brk[1:], cols.size)
        # order: by xrow (bin-major), longest first
        plen = pend - brk
        order = np.lexsort((-plen, xrow[brk]))
        chunks = []
        for t in order:
            p, e = int(brk[t]), int(pend[t])
            while e - p > 0:
                k = min(e - p, LANES)
                xr = int(xrow[p])
                r = int(rowl[p])
                y2d = r >> 7
                tcell = (y2d % SUB, r & 127)
                placed = False
                for ch in chunks[-12:]:
                    s, why = ch.try_place(xr, lane[p:p + k].tolist(),
                                          tcell, r & 127)
                    if s >= 0:
                        placed = True
                        break
                    miss[why] += 1
                if not placed:
                    ch = Chunk()
                    chunks.append(ch)
                    s, why = ch.try_place(xr, lane[p:p + k].tolist(),
                                          tcell, r & 127)
                    if s < 0:
                        spilled += k
                p += k
        tot_chunks += len(chunks)
        tot_slots += sum(c.nslots for c in chunks)
    alloc = tot_chunks * SUB * LANES
    print(f"groups={ngroups} chunks={tot_chunks} "
          f"alloc_slots={alloc} ({alloc/nnz:.2f} slots/nnz) "
          f"used={tot_slots} fill={tot_slots/max(alloc,1):.2f} "
          f"spilled={spilled} ({spilled/nnz*100:.2f}%)")
    print(f"miss: {miss}  t={time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
