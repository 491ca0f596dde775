from .mesh import make_mesh, replicated, view_sharded  # noqa: F401
from .train import make_parallel_train_step  # noqa: F401
