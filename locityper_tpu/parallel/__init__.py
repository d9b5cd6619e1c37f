from .mesh import (auto_mesh, full_step, make_mesh, sharded_align,  # noqa: F401
                   sharded_filter_scores, sharded_recruit_pairs, sharded_solve,
                   sharded_stage_solver)
