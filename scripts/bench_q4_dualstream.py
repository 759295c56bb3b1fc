"""Dual-stream MoE decode experiment (int4 b=1, VERDICT r5 #1 cont.).

The floor bench (bench_q4_floor) showed this chip's DMA reaches ~820 GB/s
with TWO concurrent ~2 MB streams per grid step but only ~540 GB/s with
one — and the shipping b=1 MoE kernel walks one ~1.9 MB expert per grid
step (~550 GB/s observed). Variant: grid (1, ceil(V/2)) with two expert
streams (even visits on A, odd on B): each step fetches TWO experts
concurrently and computes both.

Experts come pe-APPENDED (E+2 tensor, visits = idx columns) so a single
stream family serves both; compare vs the shipping with_shared dual-stream
kernel at identical math.
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

from deepseek_ocr2_tpu.ops.linear_q4 import _SUB, _dot_default, linear_q4, quantize_linear_q4
from deepseek_ocr2_tpu.ops.moe_q4 import _q4_swiglu, moe_ffn_decode_q4, quantize_experts_q4

H, I, E, K, NSH = 1280, 896, 64, 6, 2


def _dual_kernel(
    idx_ref,  # [V] i32 (scalar prefetch; V even)
    x_ref,  # [1, Hp]
    wv_ref,  # [V, 1] f32
    gu_a, gus_a, d_a, ds_a,  # stream A: expert idx[2s]
    gu_b, gus_b, d_b, ds_b,  # stream B: expert idx[2s+1]
    o_ref,  # [1, H]
):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[:]
    ya = _q4_swiglu(x, gu_a, gus_a, d_a, ds_a)
    yb = _q4_swiglu(x, gu_b, gus_b, d_b, ds_b)
    o_ref[:] = o_ref[:] + ya * wv_ref[2 * s, 0] + yb * wv_ref[2 * s + 1, 0]


def moe_q4_dual(x, eq, wts, idx):
    """b=1, V = idx.shape[1] even, experts pe-appended."""
    b, h = x.shape
    e, hp2, i2 = eq["gu_q4"].shape
    gg = eq["gu_scale"].shape[1]
    ip2 = eq["down_q4"].shape[1]
    dg = eq["down_scale"].shape[1]
    v = idx.shape[1]
    assert v % 2 == 0
    xp = jnp.pad(x, ((0, 0), (0, 2 * hp2 - h))) if 2 * hp2 != h else x

    def estreams(which):
        def eidx(s, idx):
            return (idx[2 * s + which], 0, 0)

        return [
            pl.BlockSpec((1, hp2, i2), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gg, i2), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ip2, h), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, h), eidx, memory_space=pltpu.VMEM),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v // 2,),
        in_specs=[
            pl.BlockSpec((b, 2 * hp2), lambda s, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 1), lambda s, idx: (0, 0), memory_space=pltpu.VMEM),
            *estreams(0),
            *estreams(1),
        ],
        out_specs=pl.BlockSpec((b, h), lambda s, idx: (0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _dual_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
    )(
        idx.reshape(-1).astype(jnp.int32),
        xp,
        wts.reshape(v, 1).astype(jnp.float32),
        eq["gu_q4"], eq["gu_scale"], eq["down_q4"], eq["down_scale"],
        eq["gu_q4"], eq["gu_scale"], eq["down_q4"], eq["down_scale"],
    )
    return out.astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    w = jnp.asarray(rng.standard_normal((H, 129280)) * 0.02, jnp.float32)
    q4h = quantize_linear_q4(w)
    xc = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    t = time_chain(chain(lambda x: linear_q4(x, q4h)), xc)
    print(f"canary lm_head b=1: {t*1e6:7.1f} us (clean if <125)", flush=True)
    del w, q4h

    experts = {
        "gate": jnp.asarray(rng.standard_normal((E + NSH, H, I)) * 0.02, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((E + NSH, H, I)) * 0.02, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((E + NSH, I, H)) * 0.02, jnp.float32),
    }
    eq = quantize_experts_q4(experts)
    xm = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    idx = jnp.concatenate(
        [jnp.asarray(rng.integers(0, E, (1, K)), jnp.int32), jnp.asarray([[E, E + 1]], jnp.int32)], 1
    )
    wts = jnp.concatenate(
        [jnp.asarray(rng.random((1, K)), jnp.float32), jnp.ones((1, NSH), jnp.float32)], 1
    )

    want = np.asarray(moe_ffn_decode_q4(xm, eq, wts, idx), np.float32)
    got = np.asarray(moe_q4_dual(xm, eq, wts, idx), np.float32)
    err = np.abs(want - got).max() / (np.abs(want).max() + 1e-9)
    print(f"dual vs single rel err: {err:.2e}", flush=True)

    per_visit = (
        eq["gu_q4"].size + eq["down_q4"].size
        + 4 * (eq["gu_scale"].size + eq["down_scale"].size)
    ) / (E + NSH)
    nb8 = per_visit * (K + NSH)
    t = time_chain(chain(lambda x: moe_ffn_decode_q4(x, eq, wts, idx)), xm, iters_lo=64, iters_hi=512)
    print(f"moe b=1 SINGLE-STREAM (8 steps): {t*1e6:7.1f} us  {nb8/t/1e9:6.1f} GB/s", flush=True)
    t = time_chain(chain(lambda x: moe_q4_dual(x, eq, wts, idx)), xm, iters_lo=64, iters_hi=512)
    print(f"moe b=1 DUAL-STREAM  (4 steps): {t*1e6:7.1f} us  {nb8/t/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
