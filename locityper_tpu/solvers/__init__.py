from .solve import Scheme, Stage, solve_locus, Genotyping  # noqa: F401
