#!/bin/bash
# Final round-3 cleanup pass (launch ONLY after the previous sweep python
# exits — one TPU client at a time): BTILE sddmm rows (the slab-validation
# fix landed mid-sweep; builds are format-cache warm), spgemm reruns with
# the fixed timing/413-free bench, and the K-sweep btile rows.
cd "$(dirname "$0")/.."
exec bash tools/run_resumable.sh python tools/sweep.py \
  --job "mats=datasets/subset_r3_btile.txt;formats=btile;workloads=sddmm;impls=pallas;kdim=64;out=out_logs_r4" \
  --job "mats=datasets/subset_r3_spgemm.txt;formats=csr;workloads=spgemm;impls=xla;out=out_logs_r4" \
  --job "mats=datasets/subset_r3_k.txt;formats=btile;workloads=spmm,sddmm;impls=pallas;kdim=16;out=out_logs_r4_k16" \
  --job "mats=datasets/subset_r3_k.txt;formats=btile;workloads=spmm,sddmm;impls=pallas;kdim=256;out=out_logs_r4_k256"
