from . import mesh, embedding_sharding  # noqa: F401
from .mesh import make_mesh, param_shardings, batch_shardings, pad_rows_for_mesh, init_distributed  # noqa: F401
