"""Decompose moe_ffn_ragged cost at prefill scale (N=2200, k=6, E=64)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

ITERS_LO, ITERS_HI = 8, 40
N, K, E, H, I = 2200, 6, 64, 1280, 896
M = N * K


def _time_chain(make_run, *args) -> float:
    lo, hi = make_run(ITERS_LO), make_run(ITERS_HI)

    def once(fn):
        np.asarray(jax.device_get(fn(*args)))[:1]
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))[:1]
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(once(hi) - once(lo), 1e-9) / (ITERS_HI - ITERS_LO)


def chain(body):
    def make_run(iters):
        @jax.jit
        def run(x0, *rest):
            def b(x, _):
                y = body(x, *rest)
                return x0 + (y * jnp.bfloat16(1e-24)).astype(x0.dtype), ()

            x, _ = jax.lax.scan(b, x0, None, length=iters)
            return x

        return run

    return make_run


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}  N={N} k={K} E={E}")

    x = jax.random.normal(key, (N, H), jnp.bfloat16)
    token_of = jax.random.randint(key, (M,), 0, N, jnp.int32)
    flat_idx = jnp.sort(jax.random.randint(key, (M,), 0, E, jnp.int32))
    gs = jnp.bincount(flat_idx, length=E).astype(jnp.int32)
    xs = jax.random.normal(key, (M, H), jnp.bfloat16)
    wg = jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02

    # 1. Row gather [M] rows out of [N, H].
    dt = _time_chain(chain(lambda x, t: jnp.take(x, t, axis=0)[:1]), x, token_of)
    print(f"take {M} rows of [N,H]          {dt * 1e3:8.2f} ms")

    # 2. argsort alone.
    dt = _time_chain(
        chain(lambda x, f: jnp.argsort(f, stable=True)[:1][None].astype(jnp.bfloat16)),
        x,
        flat_idx,
    )
    print(f"argsort [{M}]                  {dt * 1e3:8.2f} ms")

    # 3. One ragged_dot [M,H]x[E,H,I].
    dt = _time_chain(
        chain(lambda xs, w, g: jax.lax.ragged_dot(xs, w, g)[:1, :1]), xs, wg, gs
    )
    fl = 2 * M * H * I
    print(f"ragged_dot [M,H]x[E,H,I]       {dt * 1e3:8.2f} ms  ({fl / dt / 1e12:.1f} TF/s)")

    # 4. One-hot matmul gather (P @ x).
    def onehot_gather(x, t):
        p = (t[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)).astype(
            jnp.bfloat16
        )
        return jnp.dot(p, x, preferred_element_type=jnp.float32)[:1, :1]

    dt = _time_chain(chain(onehot_gather), x, token_of)
    print(f"one-hot matmul gather          {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
