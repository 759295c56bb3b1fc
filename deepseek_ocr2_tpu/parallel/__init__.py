from .mesh import make_mesh  # noqa: F401
from .sharding import lm_param_specs, lm_param_specs_q8, shard_params  # noqa: F401
