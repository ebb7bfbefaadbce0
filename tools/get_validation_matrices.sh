#!/usr/bin/env bash
# Download the SuiteSparse validation corpus (role of the reference's
# validation_matrices/get_validation_matrices.sh). Requires network access;
# in air-gapped environments use the synthetic twins instead:
#   python tools/sweep.py --matrices datasets/validation_twins.txt ...
set -euo pipefail
DEST="${1:-validation_matrices}"
mkdir -p "$DEST"
BASE="https://suitesparse-collection-website.herokuapp.com/MM"
MATRICES=(
  Hamm/scircuit Williams/mac_econ_fwd500 Simon/raefsky3 DIMACS10/rgg_n_2_17_s0
  Simon/bbmat Simon/appu Williams/mc2depi Bova/rma10 Williams/cop20k_A
  Botonakis/thermomech_dK Williams/webbase-1M Williams/cant Sandia/ASIC_680k
  SNAP/roadNet-TX Williams/pdb1HYS TSOPF/TSOPF_RS_b300_c3 Muite/Chebyshev4
  Williams/consph SNAP/com-Youtube Rajat/rajat30 Lourakis/radiation
  Kamvar/Stanford_Berkeley DNVS/shipsec1 Fluorem/PR02R Bodendiek/CurlCurl_2
  Gupta/gupta3 Andrianov/mip1 Mittelmann/rail4284 Boeing/pwtk
  GHS_psdef/crankseg_2 PARSEC/Si41Ge41H72 TSOPF/TSOPF_RS_b2383 LAW/in-2004
  PARSEC/Ga41As41H72 LAW/eu-2005 Gleich/wikipedia-20051105
  DIMACS10/kron_g500-logn18 Rajat/rajat31 Belcastro/human_gene1
  DIMACS10/delaunay_n22 JGD_GL7d/GL7d20 SNAP/sx-stackoverflow
  GHS_psdef/ldoor Dziekonski/dielFilterV2real Freescale/circuit5M
  SNAP/soc-LiveJournal1 Oberwolfach/bone010 GHS_psdef/audikw_1 vanHeukelum/cage15
  GenBank/kmer_V2a
)
for M in "${MATRICES[@]}"; do
  NAME=$(basename "$M")
  [ -f "$DEST/$NAME.mtx" ] && { echo "have $NAME"; continue; }
  echo "fetch $M"
  wget -q "$BASE/$M.tar.gz" -O "$DEST/$NAME.tar.gz" || { echo "FAILED $M"; continue; }
  tar -xzf "$DEST/$NAME.tar.gz" -C "$DEST" --strip-components=1 "$NAME/$NAME.mtx"
  rm -f "$DEST/$NAME.tar.gz"
done
