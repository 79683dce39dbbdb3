from .mesh import (make_mesh, param_sharding_rules, param_shardings,  # noqa: F401
                   shard_batch, shard_params)
from . import distributed  # noqa: F401
