#!/bin/bash
# Round-3 evidence sweep, take 2: ALL jobs in ONE python process (each new
# process pays a ~10-minute remote-worker handshake — the phased take-1
# script lost most of its budget to them). The restart wrapper still
# handles worker death (exit 3); done-logs make restarts incremental.
cd "$(dirname "$0")/.."
L=out_logs_r4
mkdir -p $L
exec bash tools/run_resumable.sh python tools/sweep.py \
  --job "mats=datasets/subset_r3_main.txt;formats=closg,sellw,sellr;workloads=spmv;impls=pallas;out=$L" \
  --job "mats=datasets/subset_r3_btile.txt;formats=btile;workloads=spmm,sddmm;impls=pallas;kdim=64;out=$L" \
  --job "mats=datasets/subset_r3_btile.txt;formats=csr;workloads=spmm,sddmm;impls=xla;kdim=64;out=$L" \
  --job "mats=datasets/subset_r3_solver.txt;formats=closg;workloads=cg,bicgstab;impls=pallas;out=$L" \
  --job "mats=datasets/subset_r3_spgemm.txt;formats=csr;workloads=spgemm,trisolve;impls=xla;out=$L" \
  --job "mats=datasets/subset_r3_ds.txt;formats=csrds;workloads=spmv;impls=xla;out=$L" \
  --job "mats=datasets/subset_r3_mtx.txt;formats=csr;workloads=spmv;impls=xla;out=${L}_mtx" \
  --job "mats=datasets/subset_r3_mtx.txt;formats=closg;workloads=spmv;impls=pallas;out=${L}_mtx" \
  --job "mats=datasets/subset_r3_k.txt;formats=btile;workloads=spmm,sddmm;impls=pallas;kdim=16;out=${L}_k16" \
  --job "mats=datasets/subset_r3_k.txt;formats=btile;workloads=spmm,sddmm;impls=pallas;kdim=128;out=${L}_k128" \
  --job "mats=datasets/subset_r3_k.txt;formats=btile;workloads=spmm,sddmm;impls=pallas;kdim=256;out=${L}_k256" \
  --job "mats=datasets/subset_r3_k.txt;formats=csr;workloads=spmm,sddmm;impls=xla;kdim=16;out=${L}_k16" \
  --job "mats=datasets/subset_r3_k.txt;formats=csr;workloads=spmm,sddmm;impls=xla;kdim=128;out=${L}_k128" \
  --job "mats=datasets/subset_r3_k.txt;formats=csr;workloads=spmm,sddmm;impls=xla;kdim=256;out=${L}_k256"
