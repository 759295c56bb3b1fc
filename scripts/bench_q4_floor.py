"""Per-launch fixed cost + DMA-efficiency curve for the b=1 decode design.

Measures, in ONE process (within-run A/B only, difference-method timing):
  1. pallas launch fixed cost (tiny kernel, grid=(1,)).
  2. DMA skeleton GB/s vs per-step block size (grid steps x block MB), one
     input stream, no unpack (i8 slab -> one row copied out).
  3. Same total bytes as 2 concurrent streams per step.
This is the roofline the int4 b=1 kernels must be designed against.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _bench_util import chain, time_chain  # noqa: E402

from deepseek_ocr2_tpu.ops.linear_q4 import linear_q4, quantize_linear_q4


def _tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def tiny(x):
    return pl.pallas_call(
        _tiny_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


def _skel_kernel(x_ref, w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = x_ref[:]

    o_ref[:] = o_ref[:] + w_ref[:1, :128].astype(jnp.float32)


def skel(x, w, rows_per_step):
    n = w.shape[0] // rows_per_step
    return pl.pallas_call(
        _skel_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, w.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(x, w)


def _skel2_kernel(x_ref, a_ref, b_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = x_ref[:]

    o_ref[:] = o_ref[:] + a_ref[:1, :128].astype(jnp.float32) + b_ref[:1, :128].astype(
        jnp.float32
    )


def skel2(x, a, b, rows_per_step):
    n = a.shape[0] // rows_per_step
    return pl.pallas_call(
        _skel2_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, b.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(x, a, b)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # canary
    w = jnp.asarray(rng.standard_normal((1280, 129280)) * 0.02, jnp.float32)
    q4h = quantize_linear_q4(w)
    xc = jnp.asarray(rng.standard_normal((1, 1280)) * 0.5, jnp.bfloat16)
    t = time_chain(chain(lambda x: linear_q4(x, q4h)), xc)
    print(f"canary lm_head b=1: {t*1e6:7.1f} us", flush=True)
    del w, q4h

    x = jnp.ones((8, 128), jnp.float32)
    t = time_chain(chain(tiny), x, iters_lo=64, iters_hi=512)
    print(f"launch fixed cost (tiny kernel): {t*1e6:6.2f} us", flush=True)

    # DMA curve: total 16 MB i8, block sizes 0.25..8 MB (width 8192 lanes)
    width = 8192
    total_rows = 2048  # 16 MB
    wbig = jnp.asarray(rng.integers(-100, 100, (total_rows, width)), jnp.int8)
    nb = wbig.size
    xs = jnp.ones((1, 128), jnp.float32)
    for rows in (32, 64, 128, 256, 512, 1024):
        mb = rows * width / 2**20
        t = time_chain(chain(lambda x: skel(x, wbig, rows)), xs, iters_lo=64, iters_hi=256)
        print(
            f"skeleton 1-stream block {mb:5.2f} MB x {total_rows//rows:3d} steps: "
            f"{t*1e6:7.1f} us  {nb/t/1e9:6.1f} GB/s",
            flush=True,
        )
    # 2 concurrent streams, same total
    a = wbig[: total_rows // 2]
    b = wbig[total_rows // 2 :]
    for rows in (32, 64, 128, 256, 512):
        mb = rows * width / 2**20
        t = time_chain(chain(lambda x: skel2(x, a, b, rows)), xs, iters_lo=64, iters_hi=256)
        print(
            f"skeleton 2-stream block {mb:5.2f} MB x {total_rows//2//rows:3d} steps: "
            f"{t*1e6:7.1f} us  {nb/t/1e9:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
