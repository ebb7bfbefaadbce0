from .cg import (cg, bicgstab, make_precond, solve_cg, solve_bicgstab, solve_cg_ic0,
                 solve_bicgstab_ilu0, SolveResult)
from .cg import make_precond_state
from .ilu import (ilu0, ic0, build_level_schedule, build_chunk_schedule,
                  build_schedule, sptrsv, ilu0_solve, LevelSchedule,
                  ChunkSchedule, SchedulePaddingError)
