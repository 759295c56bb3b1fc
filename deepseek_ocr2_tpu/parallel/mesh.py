"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2 parallelism table); the
TPU build scales with `jax.sharding.Mesh` over ICI:
- `dp`: data/page-level parallelism (batched multi-page serving),
- `mp`: model parallelism — attention heads / MLP columns (TP) and routed
  experts (EP) shard over this axis.

Collectives are inserted by XLA from sharding annotations (psum/all-gather
over ICI); there is no hand-written communication code to port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    mp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (dp, mp) mesh. dp defaults to n_devices // mp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % mp == 0, (n, mp)
        dp = n // mp
    assert dp * mp == n, f"dp*mp ({dp}*{mp}) != device count {n}"
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))
