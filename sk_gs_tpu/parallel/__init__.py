from .mesh import make_mesh, replicated, view_sharded  # noqa: F401
