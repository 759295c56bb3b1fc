"""Attribute the q4 lm_head kernel gap: strided weight DMA vs VPU unpack.

The shipping wide-path kernel (ops/linear_q4.linear_q4) reads column blocks
[kp2, block_o] of the row-major packed [640, 129280] lm_head — each block row
is a ~6.5 KB chunk at a 129 KB stride.  Hypotheses for the measured ~440 GB/s
(vs ~740 contiguous peak):
  (a) strided DMA — test: pre-tile the packed weight into block-major
      [nb, kp2, bo] so every grid step's read is contiguous;
  (b) VPU nibble unpack — test: same DMA pattern, dot on the raw i8 slab
      (one convert, no shifts) as a DMA+dot lower bound.

Run manually on an idle TPU (one TPU process at a time).
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

from deepseek_ocr2_tpu.ops.linear_q4 import (
    _GRP,
    _SUB,
    _dot_default,
    linear_q4,
    linear_q4_xla,
    q4_dot_slabs,
    quantize_linear_q4,
)

IN, OUT = 1280, 129280  # lm_head


def _tiled_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    kp2 = w_ref.shape[1]
    o_ref[:] = q4_dot_slabs(
        x,
        lambda j: w_ref[0, j * _SUB : (j + 1) * _SUB, :],
        lambda g: s_ref[0, g : g + 1, :],
        kp2 // _SUB,
        _dot_default,
    )


def linear_q4_tiled(x, q4_t, s_t, out_dim):
    """q4_t [nb, kp2, bo] block-major contiguous; s_t [nb, g, bo]."""
    nb, kp2, bo = q4_t.shape
    kp = 2 * kp2
    b = x.shape[0]
    out = pl.pallas_call(
        _tiled_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b, kp), lambda oi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp2, bo), lambda oi: (oi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp // _GRP, bo), lambda oi: (oi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bo), lambda oi: (0, oi), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb * bo), jnp.float32),
    )(x, q4_t, s_t)
    return out[:, :out_dim]


def _noshift_kernel(x_ref, w_ref, s_ref, o_ref):
    """DMA + dot lower bound: same block reads, i8 slab -> bf16 convert, one
    dot per slab (half the MXU passes, no shifts) — NOT numerically right."""
    x = x_ref[:]
    kp2 = w_ref.shape[1]
    acc = None
    for j in range(kp2 // _SUB):
        wslab = w_ref[0, j * _SUB : (j + 1) * _SUB, :].astype(x.dtype)
        t = _dot_default(x[:, j * _SUB : (j + 1) * _SUB], wslab)
        acc = t if acc is None else acc + t
    o_ref[:] = acc


def linear_q4_noshift(x, q4_t, s_t, out_dim):
    nb, kp2, bo = q4_t.shape
    b = x.shape[0]
    out = pl.pallas_call(
        _noshift_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b, kp2), lambda oi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp2, bo), lambda oi: (oi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * kp2 // _GRP, bo), lambda oi: (oi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bo), lambda oi: (0, oi), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb * bo), jnp.float32),
    )(x[:, :kp2], q4_t, s_t)
    return out[:, :out_dim]


def tile_q4(q4, bo):
    kp2, out_dim = q4["q4"].shape
    assert out_dim % bo == 0, (out_dim, bo)
    nb = out_dim // bo
    q4_t = jnp.asarray(
        np.ascontiguousarray(np.asarray(q4["q4"]).reshape(kp2, nb, bo).transpose(1, 0, 2))
    )
    s_t = jnp.asarray(
        np.ascontiguousarray(np.asarray(q4["scale"]).reshape(-1, nb, bo).transpose(1, 0, 2))
    )
    return q4_t, s_t


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((IN, OUT)) * 0.02, jnp.float32)
    q4 = quantize_linear_q4(w)
    nbytes = q4["q4"].size + 4 * q4["scale"].size

    for b in (1, 8):
        x = jnp.asarray(rng.standard_normal((b, IN)) * 0.5, jnp.bfloat16)
        want = np.asarray(linear_q4_xla(x, q4, out_dtype=jnp.float32))

        t = time_chain(chain(lambda x: linear_q4(x, q4)), x)
        print(f"b={b} wide (shipping)            {t*1e6:8.1f} us  {nbytes/t/1e9:6.1f} GB/s")

        # OUT = 128 * 1010; block widths must be 128-aligned divisors.
        for bo in (1280, 12928):
            q4_t, s_t = tile_q4(q4, bo)
            got = np.asarray(linear_q4_tiled(x, q4_t, s_t, OUT))
            err = np.abs(want - got).max() / (np.abs(want).max() + 1e-9)
            assert err < 5e-2, (bo, err)
            t = time_chain(chain(lambda x: linear_q4_tiled(x, q4_t, s_t, OUT)), x)
            print(f"b={b} tiled contiguous bo={bo:<5d}  {t*1e6:8.1f} us  {nbytes/t/1e9:6.1f} GB/s")

            t = time_chain(chain(lambda x: linear_q4_noshift(x, q4_t, s_t, OUT)), x)
            print(f"b={b} no-unpack bound  bo={bo:<5d}  {t*1e6:8.1f} us  {nbytes/t/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
