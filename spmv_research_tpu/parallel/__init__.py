from .dist import (
    make_sparse_mesh, partition_rows_nnz_balanced, build_sharded_csr,
    ShardedCSR, distributed_spmv, distributed_cg_step,
)
from .multihost import init_multihost, weak_scaling_efficiency
from .dist import build_col_sharded_csr, distributed_spmv_psum_scatter, ColShardedCSR
from .dist_closg import build_sharded_closg, distributed_spmv_closg, ShardedClosG
from .dist_sellr import (build_dist_sellr, dist_spmv_sellr,
                         dist_spmv_sellr_host, DistSellR)
from .dist_closgx import (build_dist_closgx, dist_spmv_closgx,
                          dist_spmv_closgx_host, DistClosGX)
