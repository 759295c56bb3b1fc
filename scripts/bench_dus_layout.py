"""Why does a per-row pool DUS still scale with pool size — and which
layout fixes it?

bench_paged_write_ablate showed the per-row dynamic_update_slice chain
costs ~0.34 us/step per token of pool capacity per layer (16 DUS/step,
b=8). Hypothesis: DUS with a dynamic index on dim 1 (the page dim of
[L, P, Hh, page, D]) lowers as a masked select across P, while the
contiguous cache's DUS (dynamic index on the SECOND-MINOR cap dim of
[L, B, Hh, cap, D]) is O(1) — that's the layout the r3 pool-resident
decode attention used, measured at the byte floor.

Times ONE scan of 16 single-token writes (k+v for 8 rows) per layout, no
attention read:

  pageD   — [L, P, Hh, page, D], DUS at (li, page_id, 0, off, 0)  (current)
  flatHh  — [L, Hh, P*page, D], DUS at (li, 0, tok, 0)            (candidate)
  contig  — [L, B, Hh, cap, D], DUS at (li, r, 0, pos, 0)         (control)

Run manually on an idle TPU; compare slopes across cap, not absolutes.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

B = 8
PAGE = 128
L = 12
HH = 10
D = 128


def barrier(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def diff_time(fn, n_short=8, n_long=64):
    def run(n):
        barrier(fn(n))

    run(n_short), run(n_long)
    t0 = time.perf_counter(); run(n_short); t_s = time.perf_counter() - t0
    t0 = time.perf_counter(); run(n_long); t_l = time.perf_counter() - t0
    return (t_l - t_s) / (n_long - n_short)


def bench(cap, mode):
    n_pages = B * (cap // PAGE) + 1
    rng = np.random.default_rng(0)
    knew = jnp.asarray(rng.standard_normal((B, HH, D)) * 0.1, jnp.bfloat16)
    pos = jnp.asarray((np.arange(B) * 37 + cap // 2) % cap, jnp.int32)
    page_ids = jnp.asarray(1 + np.arange(B) * (cap // PAGE), jnp.int32) + pos // PAGE
    off = pos % PAGE
    zero = jnp.int32(0)

    if mode == "pageD":
        pool = jnp.zeros((L, n_pages, HH, PAGE, D), jnp.bfloat16)

        def write(p, li):
            for r in range(B):
                p = jax.lax.dynamic_update_slice(
                    p, knew[r][None, None, :, None, :], (li, page_ids[r], zero, off[r], zero)
                )
            return p

    elif mode == "flatHh":
        pool = jnp.zeros((L, HH, n_pages * PAGE, D), jnp.bfloat16)
        tok = page_ids * PAGE + off

        def write(p, li):
            for r in range(B):
                p = jax.lax.dynamic_update_slice(
                    p, knew[r][None, :, None, :], (li, zero, tok[r], zero)
                )
            return p

    elif mode == "contig":
        pool = jnp.zeros((L, B, HH, cap, D), jnp.bfloat16)

        def write(p, li):
            for r in range(B):
                p = jax.lax.dynamic_update_slice(
                    p, knew[r][None, None, :, None, :], (li, jnp.int32(r), zero, pos[r], zero)
                )
            return p

    pool2 = jnp.copy(pool)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(a, b_, n):
        def step(carry, i):
            a, b_ = carry
            li = jnp.remainder(i, L)
            return (write(a, li), write(b_, li)), None

        (a, b_), _ = jax.lax.scan(
            step, (a, b_), jnp.arange(n, dtype=jnp.int32)
        )
        return jnp.sum(a[:, :1].astype(jnp.float32)) + jnp.sum(b_[:, :1].astype(jnp.float32))

    per = diff_time(lambda n: loop(pool, pool2, n))
    print(f"cap={cap:5d} mode={mode:7s}: {per * 1e6:9.1f} us/step", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    for cap in (448, 1280, 2176):
        for mode in ("pageD", "flatHh", "contig"):
            bench(cap, mode)


if __name__ == "__main__":
    main()
