#!/usr/bin/env python
"""Packing sim for the SELLX span-chunk scattered engine (round-3 final
design): GROUP=2048 rows, chunk = (8,128) slots bound to a span of <=SPAN
consecutive x2d windows (fill = one dynamic slice), segments = per-(row,
chunk) merged column runs, END-ALIGNED at lane r&127 (circular intervals),
placement = 8-deep pick to sublane y2d%8 + duo bit (y2d>>3), plain acc.

Constraints modeled per chunk:
  * umap: per (sublane, src lane) one u (window-in-span);
  * intervals: segments occupy circular [e-k+1, e] per sublane, disjoint;
  * cell: one segment per (duo, s_t, lane) = per row — automatic since
    same-row pieces merge; enforced across spill chunks.

Reports slots/nnz on the scircuit twin + optional other twin lines.
"""
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")

from spmv_research_tpu.gen import generate_from_line  # noqa: E402

SUB, LANES = 8, 128
GROUP = 2048
SPAN = 32
TARGET = 960


class Chunk:
    __slots__ = ("w0", "wend", "umap", "occ", "rows")

    def __init__(self, w0, wend):
        self.w0 = w0
        self.wend = wend          # exclusive
        self.umap = [dict() for _ in range(SUB)]
        self.occ = [0] * SUB      # bitmask-ish: use int as 128-bit mask
        self.rows = set()

    def try_seg(self, r, lanes_u):
        """Segment of row r: list of (lane, u). End-aligned at e=r&127,
        circular interval of len k. Returns sublane or -1."""
        if r in self.rows:
            return -1
        k = len(lanes_u)
        if k > LANES:
            return -1
        e = r & 127
        # circular interval mask [e-k+1, e]
        mask = 0
        for i in range(k):
            mask |= 1 << ((e - i) % LANES)
        for s in range(SUB):
            if self.occ[s] & mask:
                continue
            um = self.umap[s]
            ok = True
            for (c, u) in lanes_u:
                if um.get(c, u) != u:
                    ok = False
                    break
            if not ok:
                continue
            for (c, u) in lanes_u:
                um[c] = u
            self.occ[s] |= mask
            self.rows.add(r)
            return s
        return -1


def run(host, group=GROUP, span=SPAN, target=TARGET, verbose=True):
    m, nnz = host.m, host.nnz
    ia = host.ia.astype(np.int64)
    ja = host.ja.astype(np.int64)
    ngroups = (m + group - 1) // group
    tot_chunks = 0
    tot_spill_chunks = 0
    tot_slots = 0
    seg_lens = []
    for g in range(ngroups):
        r0, r1 = g * group, min((g + 1) * group, m)
        e0, e1 = int(ia[r0]), int(ia[r1])
        if e0 == e1:
            continue
        cols = ja[e0:e1]
        lens = (ia[r0 + 1:r1 + 1] - ia[r0:r1])
        rowl = np.repeat(np.arange(r1 - r0, dtype=np.int64), lens)
        xrow = (cols >> 7).astype(np.int64)
        lane = (cols & 127).astype(np.int64)
        # spans: consecutive-window greedy by nnz target
        xmin, xmax = int(xrow.min()), int(xrow.max())
        wcnt = np.bincount(xrow - xmin, minlength=xmax - xmin + 1)
        spans = []  # (w0, wend) absolute
        w = 0
        while w < len(wcnt):
            acc = 0
            w2 = w
            while w2 < len(wcnt) and w2 - w < span and \
                    (acc + wcnt[w2] <= target or w2 == w):
                acc += wcnt[w2]
                w2 += 1
            spans.append((w + xmin, w2 + xmin))
            w = w2
        span_of = np.zeros(len(wcnt), np.int64)
        for si, (a, b) in enumerate(spans):
            span_of[a - xmin:b - xmin] = si
        # segments: per (row, span) runs — sort nnz by (span, row, col)
        si_all = span_of[xrow - xmin]
        order = np.lexsort((cols, rowl, si_all))
        so, ro, lo, uo = (si_all[order], rowl[order], lane[order],
                          xrow[order])
        brk = np.flatnonzero(np.r_[True, (np.diff(so) != 0)
                                   | (np.diff(ro) != 0)])
        pend = np.append(brk[1:], so.size)
        # chunks per span (primary + spill chain)
        chunks_by_span = defaultdict(list)
        nspill = 0
        for t in range(len(brk)):
            p, e = int(brk[t]), int(pend[t])
            si = int(so[p])
            r = int(ro[p])
            w0 = spans[si][0]
            # split segments longer than 128
            for q0 in range(p, e, LANES):
                q1 = min(q0 + LANES, e)
                seg = [(int(lo[i]), int(uo[i]) - w0) for i in range(q0, q1)]
                seg_lens.append(q1 - q0)
                placed = False
                for ch in chunks_by_span[si]:
                    if ch.try_seg(r, seg) >= 0:
                        placed = True
                        break
                if not placed:
                    ch = Chunk(w0, spans[si][1])
                    if chunks_by_span[si]:
                        nspill += 1
                    chunks_by_span[si].append(ch)
                    ch.try_seg(r, seg)
        nch = sum(len(v) for v in chunks_by_span.values())
        tot_chunks += nch
        tot_spill_chunks += nspill
        tot_slots += sum(len(ch.rows) and sum(
            bin(ch.occ[s]).count("1") for s in range(SUB))
            for v in chunks_by_span.values() for ch in v)
    alloc = tot_chunks * SUB * LANES
    sl = np.array(seg_lens)
    if verbose:
        print(f"  group={group} span={span} target={target}: "
              f"chunks={tot_chunks} (spill {tot_spill_chunks}) "
              f"slots/nnz={alloc/nnz:.3f} used_fill={tot_slots/alloc:.2f} "
              f"seglen mean={sl.mean():.1f} p95={np.percentile(sl,95):.0f} "
              f"max={sl.max()}")
    return alloc / nnz


def main():
    line = ("170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 "
            "scircuit_twin")
    if len(sys.argv) > 1:
        line = sys.argv[1]
    host, _ = generate_from_line(line)
    print(f"m={host.m} nnz={host.nnz}")
    for group, span, target in [(2048, 32, 960), (2048, 32, 900),
                                (1024, 32, 960), (4096, 32, 960),
                                (2048, 24, 960), (2048, 32, 1010)]:
        t0 = time.time()
        run(host, group, span, target)
        print(f"    ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()


def run_arb(host, group=4096, W=32, target=960, verbose=True):
    """Arbitrary-window chunks (per-row fill): bins assigned to chunks
    (<=W windows, <=target nnz), merged per-(row,chunk) segments,
    end-aligned circular intervals + umap; spills -> overflow chains."""
    m, nnz = host.m, host.nnz
    ia = host.ia.astype(np.int64)
    ja = host.ja.astype(np.int64)
    ngroups = (m + group - 1) // group
    tot_chunks = 0
    tot_spill = 0
    used = 0
    for g in range(ngroups):
        r0, r1 = g * group, min((g + 1) * group, m)
        e0, e1 = int(ia[r0]), int(ia[r1])
        if e0 == e1:
            continue
        cols = ja[e0:e1]
        lens = (ia[r0 + 1:r1 + 1] - ia[r0:r1])
        rowl = np.repeat(np.arange(r1 - r0, dtype=np.int64), lens)
        xrow = (cols >> 7).astype(np.int64)
        lane = (cols & 127).astype(np.int64)
        uxr, inv, bsz = np.unique(xrow, return_inverse=True,
                                  return_counts=True)
        order_b = np.argsort(-bsz)
        # greedy bin -> chunk id
        cid_of_bin = np.zeros(len(uxr), np.int64)
        loads, wins = [], []
        for bi in order_b:
            placed = False
            for ci in range(len(loads)):
                if loads[ci] + bsz[bi] <= target and wins[ci] < W:
                    cid_of_bin[bi] = ci
                    loads[ci] += bsz[bi]
                    wins[ci] += 1
                    placed = True
                    break
            if not placed:
                cid_of_bin[bi] = len(loads)
                loads.append(int(bsz[bi]))
                wins.append(1)
        nprim = len(loads)
        cid = cid_of_bin[inv]
        # window slot within chunk
        wslot = {}
        u_of_bin = np.zeros(len(uxr), np.int64)
        cnt = [0] * nprim
        for bi in range(len(uxr)):
            ci = cid_of_bin[bi]
            u_of_bin[bi] = cnt[ci]
            cnt[ci] += 1
        u_all = u_of_bin[inv]
        # segments per (cid, row)
        order = np.lexsort((cols, rowl, cid))
        co, ro, lo, uo = cid[order], rowl[order], lane[order], u_all[order]
        brk = np.flatnonzero(np.r_[True, (np.diff(co) != 0)
                                   | (np.diff(ro) != 0)])
        pend = np.append(brk[1:], co.size)
        chunks = [Chunk(0, 0) for _ in range(nprim)]
        spills = []
        for t in range(len(brk)):
            p, e = int(brk[t]), int(pend[t])
            r = int(ro[p])
            ci = int(co[p])
            for q0 in range(p, e, LANES):
                q1 = min(q0 + LANES, e)
                seg = [(int(lo[i]), int(uo[i])) for i in range(q0, q1)]
                if chunks[ci].try_seg(r, seg) >= 0:
                    used += q1 - q0
                    continue
                # spill: overflow chunks with their own window maps
                done = False
                for oc in spills[-8:]:
                    u2 = oc.wend  # abuse: per-chunk dict of xrow->u
                    segx = []
                    okw = True
                    for i in range(q0, q1):
                        xr = int((uo[i], )[0])  # placeholder
                    # simpler: rebuild with xrow-based u map
                    xr_seg = [(int(lane[order[i]]),
                               int(xrow[order[i]])) for i in range(q0, q1)]
                    u2map = oc.w0  # dict xrow -> u
                    nw = len(u2map)
                    ok = True
                    for (c_, xr_) in xr_seg:
                        if xr_ not in u2map and nw + 1 > W:
                            ok = False
                            break
                        if xr_ not in u2map:
                            u2map[xr_] = nw
                            nw += 1
                    if not ok:
                        continue
                    seg2 = [(c_, u2map[xr_]) for (c_, xr_) in xr_seg]
                    if oc.try_seg(r, seg2) >= 0:
                        done = True
                        used += q1 - q0
                        break
                if not done:
                    oc = Chunk({}, 0)
                    spills.append(oc)
                    xr_seg = [(int(lane[order[i]]), int(xrow[order[i]]))
                              for i in range(q0, q1)]
                    u2map = oc.w0
                    for j, (c_, xr_) in enumerate(xr_seg):
                        if xr_ not in u2map:
                            u2map[xr_] = len(u2map)
                    seg2 = [(c_, u2map[xr_]) for (c_, xr_) in xr_seg]
                    if oc.try_seg(r, seg2) >= 0:
                        used += q1 - q0
        tot_chunks += nprim + len(spills)
        tot_spill += len(spills)
    alloc = tot_chunks * SUB * LANES
    if verbose:
        print(f"  arb group={group} W={W} target={target}: "
              f"chunks={tot_chunks} (spill {tot_spill}) "
              f"slots/nnz={alloc/nnz:.3f} placed={used}/{nnz}")
    return alloc / nnz


def main_arb():
    line = ("170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 "
            "scircuit_twin")
    if len(sys.argv) > 1:
        line = sys.argv[1]
    host, _ = generate_from_line(line)
    print(f"m={host.m} nnz={host.nnz}")
    for group, W, target in [(4096, 32, 960), (4096, 32, 900),
                             (2048, 32, 960), (8192, 32, 960),
                             (4096, 24, 960)]:
        t0 = time.time()
        run_arb(host, group, W, target)
        print(f"    ({time.time()-t0:.1f}s)")
