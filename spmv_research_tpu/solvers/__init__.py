from .cg import (cg, bicgstab, make_precond, solve_cg, solve_bicgstab, solve_cg_ic0,
                 solve_bicgstab_ilu0, SolveResult)
from .ilu import ilu0, ic0, build_level_schedule, sptrsv, ilu0_solve, LevelSchedule
