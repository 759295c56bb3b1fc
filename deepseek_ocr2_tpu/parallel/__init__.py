from .mesh import make_mesh  # noqa: F401
from .sharding import lm_param_specs, shard_params  # noqa: F401
