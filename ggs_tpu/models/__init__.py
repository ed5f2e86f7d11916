from . import ga, genome, operators, sa  # noqa: F401
