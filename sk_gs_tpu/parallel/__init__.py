from .mesh import (init_distributed, make_mesh, replicated,  # noqa: F401
                   view_sharded)
