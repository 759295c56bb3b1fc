"""Grouped-GEMM MoE prefill — Pallas visit-scheduled kernels.

`jax.lax.ragged_dot` lowers poorly on this TPU backend (measured 5.3 TF/s
vs ~80 TF/s for plain GEMMs at the same shapes — scripts/bench_moe_pieces.py),
which made MoE prefill ~25x off roofline and the dominant cost of every
serving prefill. These kernels implement the sorted grouped GEMM directly:

- assignments are sorted by expert (XLA argsort + row gather — both cheap,
  0.3 ms at M=13k), giving contiguous per-expert row groups;
- a static *visit* schedule covers the sorted rows with (row-tile, expert)
  pairs: each tile of `bm` rows is visited once per expert whose group
  intersects it. Total visits are bounded by ceil(M/bm) + E (each expert
  adds at most one tile crossing), so the grid is static while group sizes
  stay data-dependent (no host sync, no capacity dropping — exact routing);
- per visit, the kernel DMAs that expert's weights, computes the full tile,
  and writes only the rows inside the group (each row belongs to exactly
  one expert, so no cross-visit accumulation is needed);
- visit metadata (tile, expert, row bounds) is computed on-device with
  vectorized searchsorted over the group-offset prefix sums and fed to the
  kernel via scalar prefetch.

Numerics match ops/moe.moe_ffn_ragged exactly: bf16 GEMMs rounded at the
same points, silu in f32, final combine in f32 on the XLA side.

Reference parity note: replaces the reference's CPU-sorted per-expert GEMM
slices (deepseek_v2.rs:706-797) at TPU speed.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 256  # row-tile height for prefill-scale M (VMEM fits 2.3 MB expert blocks)


def _pick_bm(m: int) -> int:
    """Row-tile height. Every expert with assignments costs >= 1 visit, and a
    visit computes a full bm-row tile — at decode scale (M a few hundred,
    most visits nearly empty) big tiles turn the kernel compute-bound on
    garbage rows (measured 31.5 ms/step at b=32 with bm=256 vs 19.2 dense).
    Small tiles keep the kernel at the weight-bandwidth floor instead."""
    if m >= 2048:
        return _BM
    return 32


def _visit_schedule(group_sizes: jnp.ndarray, m_pad: int, bm: int):
    """Static-shape visit schedule over sorted rows.

    Returns (tile [V], expert [V], lo [V], hi [V]) i32 arrays with
    V = m_pad//bm + E. Unused slots point at the last tile with an empty
    row range (the kernel masks them to no-ops).
    """
    e = group_sizes.shape[0]
    n_tiles = m_pad // bm
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes).astype(jnp.int32)]
    )  # [E+1]
    starts, ends = offsets[:-1], offsets[1:]
    tile_start = jnp.arange(n_tiles, dtype=jnp.int32) * bm
    tile_end = tile_start + bm
    # First/last expert whose group intersects each tile (empty experts may
    # slip into the range; they produce empty row bounds and are masked).
    e_first = jnp.searchsorted(ends, tile_start, side="right").astype(jnp.int32)
    e_last = (jnp.searchsorted(starts, tile_end, side="left") - 1).astype(jnp.int32)
    count = jnp.maximum(e_last - e_first + 1, 0)
    # Tiles fully past the real rows get count 0 (their out rows are sliced
    # off by the caller); every real tile has count >= 1.
    cum = jnp.cumsum(count)
    v_total = n_tiles + e
    v_ids = jnp.arange(v_total, dtype=jnp.int32)
    tile = jnp.searchsorted(cum, v_ids, side="right").astype(jnp.int32)
    valid = tile < n_tiles
    tile_c = jnp.minimum(tile, n_tiles - 1)
    rank = v_ids - jnp.where(valid, cum[tile_c] - count[tile_c], 0)
    expert = jnp.clip(e_first[tile_c] + rank, 0, e - 1)
    lo = jnp.maximum(offsets[expert], tile_c * bm)
    hi = jnp.minimum(offsets[expert + 1], tile_c * bm + bm)
    lo = jnp.where(valid, lo, 0)
    hi = jnp.where(valid, hi, 0)
    return tile_c, expert, lo, hi


def _dot(a, b):
    # bf16 dots pin DEFAULT precision (the global "highest" used by CPU
    # parity tests lowers them to multi-pass forms Mosaic rejects); f32 dots
    # keep HIGHEST so the interpret-mode kernel matches the XLA paths bit
    # for bit (on CPU, f32 DEFAULT is a lower-precision decomposition).
    prec = (
        jax.lax.Precision.HIGHEST
        if a.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _gmm_swiglu_kernel(vt_ref, ve_ref, lo_ref, hi_ref, x_ref, g_ref, u_ref, o_ref, *, bm):
    v = pl.program_id(0)
    row0 = vt_ref[v] * bm
    ga = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    in_rows = (ga >= lo_ref[v]) & (ga < hi_ref[v])  # [BM, 1]
    x = x_ref[:]
    # Round each GEMM to the compute dtype exactly like the XLA grouped path
    # (ragged_dot/einsum emit bf16) so greedy parity is bit-identical.
    gate = _dot(x, g_ref[0]).astype(x.dtype)
    up = _dot(x, u_ref[0]).astype(x.dtype)
    act = (jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up)
    o_ref[:] = jnp.where(in_rows, act, o_ref[:])


def _gmm_down_kernel(vt_ref, ve_ref, lo_ref, hi_ref, a_ref, d_ref, o_ref, *, bm):
    v = pl.program_id(0)
    row0 = vt_ref[v] * bm
    ga = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    in_rows = (ga >= lo_ref[v]) & (ga < hi_ref[v])
    a = a_ref[:]
    y = _dot(a, d_ref[0]).astype(a.dtype)
    o_ref[:] = jnp.where(in_rows, y, o_ref[:])


def _gmm_call(kernel, schedule, x, w, out_dim, *, bm, interpret=False):
    vt, ve, lo, hi = schedule
    m_pad, _ = x.shape
    v_total = vt.shape[0]
    e, in_dim = w.shape[0], w.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(v_total,),
        in_specs=[
            pl.BlockSpec(
                (bm, in_dim),
                lambda v, vt, ve, lo, hi: (vt[v], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, in_dim, out_dim),
                lambda v, vt, ve, lo, hi: (ve[v], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, out_dim),
            lambda v, vt, ve, lo, hi: (vt[v], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, out_dim), x.dtype),
        interpret=interpret,
    )(vt, ve, lo, hi, x, w)


def _gmm_swiglu_call(schedule, x, w_gate, w_up, *, bm, interpret=False):
    vt, ve, lo, hi = schedule
    m_pad, in_dim = x.shape
    v_total = vt.shape[0]
    i = w_gate.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(v_total,),
        in_specs=[
            pl.BlockSpec(
                (bm, in_dim),
                lambda v, vt, ve, lo, hi: (vt[v], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, in_dim, i),
                lambda v, vt, ve, lo, hi: (ve[v], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, in_dim, i),
                lambda v, vt, ve, lo, hi: (ve[v], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, i),
            lambda v, vt, ve, lo, hi: (vt[v], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_gmm_swiglu_kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, i), x.dtype),
        interpret=interpret,
    )(vt, ve, lo, hi, x, w_gate, w_up)


@jax.custom_vjp
def _moe_ffn_gmm_diff(x_flat, experts, weights, idx):
    return _moe_ffn_gmm_impl(x_flat, experts, weights, idx)


def _moe_ffn_gmm_fwd(x_flat, experts, weights, idx):
    out = _moe_ffn_gmm_impl(x_flat, experts, weights, idx)
    return out, (x_flat, experts, weights, idx)


def _moe_ffn_gmm_bwd(res, g):
    # Backward through the XLA grouped path (numerically the same function;
    # the Pallas kernels define no VJP). Training steps on TPU pay the
    # slower ragged_dot only in the backward pass.
    import numpy as np

    from .moe import moe_ffn_ragged

    x_flat, experts, weights, idx = res
    _, vjp = jax.vjp(
        lambda x, e, w: moe_ffn_ragged(x, e, w, idx), x_flat, experts, weights
    )
    dx, de, dw = vjp(g)
    d_idx = np.zeros(idx.shape, jax.dtypes.float0)  # integer arg: no gradient
    return dx, de, dw, d_idx


_moe_ffn_gmm_diff.defvjp(_moe_ffn_gmm_fwd, _moe_ffn_gmm_bwd)


def moe_ffn_gmm(
    x_flat: jnp.ndarray,  # [N, H]
    experts: Dict[str, jnp.ndarray],  # gate/up: [E, H, I], down: [E, I, H]
    weights: jnp.ndarray,  # [N, k] f32
    idx: jnp.ndarray,  # [N, k] i32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact grouped-GEMM MoE FFN (prefill scale). Returns [N, H] in x dtype.

    Differentiable: the forward runs the Pallas kernels, the backward runs
    the VJP of the XLA grouped path (same math)."""
    if interpret:
        return _moe_ffn_gmm_impl(x_flat, experts, weights, idx, interpret=True)
    return _moe_ffn_gmm_diff(x_flat, experts, weights, idx)


def _moe_ffn_gmm_impl(
    x_flat: jnp.ndarray,
    experts: Dict[str, jnp.ndarray],
    weights: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    n, h = x_flat.shape
    k = idx.shape[1]
    e = experts["gate"].shape[0]
    m = n * k
    bm = _pick_bm(m)
    m_pad = -(-m // bm) * bm

    flat_idx = idx.reshape(m)
    order = jnp.argsort(flat_idx, stable=True)
    token_of = order // k
    x_sorted = jnp.take(x_flat, token_of, axis=0)  # [M, H] (cheap row gather)
    if m_pad != m:
        x_sorted = jnp.pad(x_sorted, ((0, m_pad - m), (0, 0)))
    group_sizes = jnp.bincount(flat_idx, length=e).astype(jnp.int32)

    schedule = _visit_schedule(group_sizes, m_pad, bm)
    act = _gmm_swiglu_call(
        schedule, x_sorted, experts["gate"], experts["up"], bm=bm, interpret=interpret
    )  # [M_pad, I]
    y_sorted = _gmm_call(
        _gmm_down_kernel, schedule, act, experts["down"], h, bm=bm, interpret=interpret
    )[:m]  # [M, H]

    inv = jnp.argsort(order, stable=True)
    y = jnp.take(y_sorted, inv, axis=0).reshape(n, k, h)
    out = jnp.sum(y.astype(jnp.float32) * weights[:, :, None], axis=1)
    return out.astype(x_flat.dtype)
