from .mesh import make_mesh, sharded_filter_scores, sharded_solve, full_step  # noqa: F401
