from .mesh import make_mesh  # noqa: F401
from .sharded import sharded_train_step  # noqa: F401
