from . import mesh, shard  # noqa: F401
from .mesh import auto_mesh, make_mesh  # noqa: F401
