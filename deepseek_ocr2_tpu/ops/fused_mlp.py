"""Fused ViT MLP (linear -> exact-erf GELU -> linear) — Pallas M-tiled kernel.

The XLA lowering of SAM's block MLP round-trips the [M, 4E] intermediate
through HBM twice (bf16 dot output, f32 gelu input/output) and leaves the
MXU idle during the erf pass: measured 4.52 ms per block at M=16384
(B=4 x 1024^2 tokens) vs a ~1.9 ms MXU floor (scripts/bench_sam_phases.py).
Here both weights stay VMEM-resident across the whole grid (their block
index never changes, so they are DMA'd once), each grid step computes a
row tile end-to-end in VMEM, and the tile is split into two independent
halves so Mosaic can overlap one half's VPU erf with the other half's MXU
dots.

Numerics: the kernel writes the same rounding points as the XLA path —
f32-accumulated dot rounded to the model dtype, bias add in the model
dtype, erf-GELU in f32 (exact form per reference sam.rs:168-171, erf via
a 1.5e-7-accurate polynomial — see _erf), round, second dot, bias add.
Two sub-ulp deviations from the XLA form remain: the erf polynomial
(1.5e-7 abs, far below bf16 resolution) and the compiler folding the
bf16->f32 convert chain between stages (skips one intermediate rounding).
SAM's bf16 tower is not bit-pinned; the binding contract is LM-level
greedy parity, and the f32 vision parity tests run where Pallas is
disabled (models/sam._block gates on pallas_enabled), exercising the XLA
form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .moe_gmm import _dot


_INV_SQRT2 = 0.7071067811865476


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7).

    Mosaic has no TPU lowering for lax.erf/erfc (KernelType.TC
    "Unimplemented primitive"), so the kernel evaluates the classic
    rational-polynomial form with primitives it does support (exp, div).
    1.5e-7 absolute is far below bf16 resolution (~4e-3 at gelu scales)."""
    a1 = jnp.float32(0.254829592)
    a2 = jnp.float32(-0.284496736)
    a3 = jnp.float32(1.421413741)
    a4 = jnp.float32(-1.453152027)
    a5 = jnp.float32(1.061405429)
    p = jnp.float32(0.3275911)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x32):
    """Exact-form GELU 0.5*x*(1+erf(x/sqrt2)) with the polynomial erf."""
    return 0.5 * x32 * (1.0 + _erf(x32 * jnp.float32(_INV_SQRT2)))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref):
    """Grid (m_tiles, n_s): sub-step s consumes the s-th F-column block of
    w1/b1 and the matching F-row block of w2 — GELU is elementwise per F
    column and the second dot sums over F, so the split is exact up to the
    f32 association of the partial down-products (accumulated in the f32
    scratch). Keeps the double-buffered weight working set inside the 16 MB
    scoped-VMEM limit at F=3072."""
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    x = x_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    b1 = b1_ref[:]

    def half(xs):
        h = _dot(xs, w1).astype(xs.dtype) + b1  # round like XLA's bf16 dot
        g = _gelu_erf(h.astype(jnp.float32)).astype(xs.dtype)
        return _dot(g, w2)

    n = x.shape[0] // 2
    y = jnp.concatenate([half(x[:n]), half(x[n:])], axis=0)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = y

    @pl.when(s > 0)
    def _():
        acc_ref[:] = acc_ref[:] + y

    @pl.when(s == n_s - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(x.dtype) + b2_ref[:]


@functools.partial(jax.jit, static_argnames=("block_m", "interpret", "n_split"))
def mlp_gelu(
    x: jnp.ndarray,  # [M, E]
    w1: jnp.ndarray,  # [E, F]
    b1: jnp.ndarray,  # [F]
    w2: jnp.ndarray,  # [F, E]
    b2: jnp.ndarray,  # [E]
    *,
    block_m: int = 512,
    interpret: bool = False,
    n_split: int | None = None,  # override the F-split (tests)
) -> jnp.ndarray:
    """x @ w1 + b1 -> exact GELU -> @ w2 + b2, fused. Returns [M, E]."""
    m, e = x.shape
    f = w1.shape[1]
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(x.dtype).reshape(1, f)
    b2 = b2.astype(x.dtype).reshape(1, e)

    m_pad = -(-m // block_m) * block_m
    xp = x if m_pad == m else jnp.pad(x, ((0, m_pad - m), (0, 0)))

    # F-split: smallest n_s whose double-buffered weight blocks fit well
    # inside the 16 MB scoped-VMEM limit alongside x/out/acc. The limit's
    # accounting has ~1-2 MB of opaque M-dependent overhead (measured: a
    # 9.4 MB weight set OOM'd by 88-204 KB at some M), so the budget leaves
    # real headroom. The per-tile weight re-stream this costs (~full weights
    # per row tile once s alternates) stays under the tile's MXU time at
    # SAM shapes.
    bytes_per_el = jnp.dtype(x.dtype).itemsize
    n_s = 1
    while (
        2 * e * (f // n_s) * bytes_per_el * 2 > 6 * 1024 * 1024
        and n_s < 8
        and f % (2 * n_s) == 0
        and (f // (2 * n_s)) % 128 == 0
    ):
        n_s *= 2
    if n_split is not None:
        assert f % n_split == 0, (f, n_split)
        n_s = n_split
    f_blk = f // n_s
    grid = (m_pad // block_m, n_s)

    out = pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, e), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, f_blk), lambda i, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_blk), lambda i, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_blk, e), lambda i, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, e), lambda i, s: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, e), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, e), jnp.float32)],
        interpret=interpret,
    )(xp, w1, b1, w2, b2)
    return out[:m]
