#!/bin/bash
# Round-3 TPU evidence sweep (VERDICT items 3/4): phased, resumable, and
# time-boxed. Each phase is one tools/sweep.py invocation under the
# restart wrapper; the done-log in $L makes re-runs incremental.
cd "$(dirname "$0")/.."
L=out_logs_r4
mkdir -p $L
R="bash tools/run_resumable.sh"
log() { echo "### $(date +%H:%M:%S) $*" | tee -a $L/phases.log; }

log "P1 csr/xla spmv baseline (20 twins)"
$R timeout 2400 python tools/sweep.py --matrices datasets/subset_r3_main.txt \
   --formats csr --workloads spmv --impls xla --out $L
log "P2 engines spmv pallas (closg sellw sellr, 20 twins)"
$R timeout 5400 python tools/sweep.py --matrices datasets/subset_r3_main.txt \
   --formats closg sellw sellr --workloads spmv --impls pallas --out $L
log "P3a btile spmm+sddmm K=64"
K_DIM=64 $R timeout 2400 python tools/sweep.py \
   --matrices datasets/subset_r3_main.txt \
   --formats btile --workloads spmm sddmm --impls pallas --out $L
log "P3b csr spmm+sddmm K=64 baseline"
K_DIM=64 $R timeout 2400 python tools/sweep.py \
   --matrices datasets/subset_r3_main.txt \
   --formats csr --workloads spmm sddmm --impls xla --out $L
log "P4 solvers cg+bicgstab (closg pallas, 8 twins)"
$R timeout 2400 python tools/sweep.py \
   --matrices datasets/subset_r3_solver.txt \
   --formats closg --workloads cg bicgstab --impls pallas --out $L
log "P5 spgemm+trisolve (incl. appu twin)"
$R timeout 2400 python tools/sweep.py \
   --matrices datasets/subset_r3_spgemm.txt \
   --formats csr --workloads spgemm trisolve --impls xla --out $L
log "P6 csrds fp64-parity spmv rows"
$R timeout 1800 python tools/sweep.py --matrices datasets/subset_r3_ds.txt \
   --formats csrds --workloads spmv --impls xla --out $L
log "P7 K sweep 16/128/256 (btile + csr, 3 twins)"
for K in 16 128 256; do
  K_DIM=$K $R timeout 900 python tools/sweep.py \
     --matrices datasets/subset_r3_k.txt \
     --formats btile --workloads spmm sddmm --impls pallas \
     --out ${L}_k$K
  K_DIM=$K $R timeout 900 python tools/sweep.py \
     --matrices datasets/subset_r3_k.txt \
     --formats csr --workloads spmm sddmm --impls xla \
     --out ${L}_k$K
done
log "sweep complete"
