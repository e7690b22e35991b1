from .mesh import make_mesh, best_mesh_shape  # noqa: F401
from .sharding import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    param_shardings,
    replicated,
)
