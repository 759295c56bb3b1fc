"""Shared micro-bench harness for scripts/.

Difference-method timing (CLAUDE.md): build the SAME jitted chain at two
scan lengths and subtract, so the ~30 ms axon dispatch floor cancels.
The sync barrier is a host transfer of one element (`np.asarray`) —
`block_until_ready` does NOT sync on this backend.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS_LO, ITERS_HI = 8, 40


def time_chain(make_run, *args, iters_lo=None, iters_hi=None, reps=5) -> float:
    """Seconds per iteration of the chain built by make_run(iters)."""
    lo_n = ITERS_LO if iters_lo is None else iters_lo
    hi_n = ITERS_HI if iters_hi is None else iters_hi
    lo, hi = make_run(lo_n), make_run(hi_n)

    def once(fn):
        np.asarray(jax.device_get(fn(*args)))[:1]  # warm + barrier
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))[:1]
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(once(hi) - once(lo), 1e-9) / (hi_n - lo_n)


def chain(body):
    """make_run factory: scan `body(x, *rest)` with a dependency-feedback
    term tiny enough (1e-24) not to perturb values but real enough that XLA
    cannot dead-code or reorder the iterations."""

    def make_run(iters):
        @jax.jit
        def run(x0, *rest):
            def b(x, _):
                y = body(x, *rest)
                f = jnp.ravel(y)[:1].astype(x0.dtype) * jnp.asarray(1e-24, x0.dtype)
                return x0 + f.reshape((1,) * x0.ndim), ()

            x, _ = jax.lax.scan(b, x0, None, length=iters)
            return x

        return run

    return make_run
