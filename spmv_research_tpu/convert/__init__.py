from .coo_csr import (
    coo_to_csr, csr_to_coo, csr_expand_symmetric, csr_drop_upper,
    fix_diagonal_zeros, csr_row_permute, make_spd, make_diag_dominant,
)
from .reorder import reverse_cuthill_mckee, rcm_reorder, sigma_sort_rows
from .features import extract_features, MatrixFeatures
from .build import (
    build_csc, build_csr_sym,
    build_csr, build_coo, build_ell, build_sellcs, build_bsr, build_dia,
    build_ldu,
)
from .cluster import kmeans_rows, kmeans_reorder, row_feature_vectors
from .cache import cached_build, save_format, load_format, matrix_digest
