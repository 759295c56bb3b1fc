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

Numerics: bf16 GEMMs rounded at the same points as the XLA grouped path
(ragged_dot), silu in f32, final combine in f32 on the XLA side. Not
bit-exact vs ragged_dot (its K-tiling rounds differently — see
test_gmm_bf16_matches_ragged_to_ulp); the binding contract is LM-level
greedy parity, pinned by the torch-oracle tests.

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

_BM = 64  # row-tile height for prefill-scale M, set from hardware ablation
# (scripts/bench_gmm_bm.py on v5e, M=13.2k: bm=64 1.171 ms vs bm=256
# 1.842 ms vs bm=32 2.059 ms — bm=64 balances the 1+E*bm/M overcompute
# against per-visit weight-DMA hiding; at M=4.2k it ties bm=256).


def _pick_bm(m: int) -> int:
    """Row-tile height. Every expert with assignments costs >= 1 visit, and a
    visit computes a full bm-row tile — at decode scale (M a few hundred,
    most visits nearly empty) big tiles turn the kernel compute-bound on
    garbage rows (measured 31.5 ms/step at b=32 with bm=256 vs 19.2 dense).
    Small tiles keep the kernel at the weight-bandwidth floor instead.

    At prefill scale the overcompute factor is 1 + E*bm/M (each of the E
    group boundaries costs one extra full tile), so smaller tiles waste
    less — bounded below by per-visit weight-DMA hiding (expert changes
    stream ~4.6 MB; the tile's GEMMs must cover that latency).
    DEEPSEEK_GMM_BM overrides for ablation."""
    import os

    env = os.environ.get("DEEPSEEK_GMM_BM")
    if env:
        return int(env)
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


def _aligned_layout(group_sizes: jnp.ndarray, m_pad: int, bm: int):
    """Expert-ALIGNED slot layout (r5, VERDICT r4 #5): pad each sorted
    expert group to a multiple of bm so every bm-row tile holds exactly ONE
    expert's rows. Versus the boundary-visit schedule this
    - halves overcompute (avg bm/2 pad rows per expert vs a full bm-row
      extra tile per group boundary): 1 + E*bm/(2M) vs 1 + E*bm/M;
    - drops the per-visit row mask AND the output block read-modify-write
      (each tile is written exactly once, no revisits);
    - skips tail tiles' GEMMs entirely (pl.when on a valid flag).

    Returns (src_slot [S] i32 gather map sorted->aligned slots,
    slot_valid [S] bool, slot_of_sorted [m_pad] i32 inverse map,
    e_tile [T] i32 per-tile expert, tile_valid [T] i32) with
    S = m_pad + E*bm (static worst case) and T = S//bm."""
    e = group_sizes.shape[0]
    s_total = m_pad + e * bm
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes).astype(jnp.int32)]
    )  # [E+1] sorted-row group starts
    aligned_sizes = (-(-group_sizes // bm) * bm).astype(jnp.int32)
    aligned_end = jnp.cumsum(aligned_sizes).astype(jnp.int32)  # [E]
    aligned_start = aligned_end - aligned_sizes
    shift = aligned_start - offsets[:-1]  # [E] slot = sorted + shift[e]

    slots = jnp.arange(s_total, dtype=jnp.int32)
    e_slot = jnp.minimum(
        jnp.searchsorted(aligned_end, slots, side="right").astype(jnp.int32), e - 1
    )
    src_slot = slots - shift[e_slot]
    slot_valid = (slots < aligned_end[e_slot]) & (
        src_slot < offsets[e_slot + 1]
    )

    rows = jnp.arange(m_pad, dtype=jnp.int32)
    g_row = jnp.minimum(
        jnp.searchsorted(offsets[1:], rows, side="right").astype(jnp.int32), e - 1
    )
    slot_of_sorted = rows + shift[g_row]

    n_tiles = s_total // bm
    t0 = jnp.arange(n_tiles, dtype=jnp.int32) * bm
    e_tile = jnp.minimum(
        jnp.searchsorted(aligned_end, t0, side="right").astype(jnp.int32), e - 1
    )
    total = aligned_end[e - 1]
    tile_valid = (t0 < total).astype(jnp.int32)
    # Invalid tail tiles point at the last real tile's expert so their
    # weight-block index never changes (no DMA).
    e_last = jnp.minimum(
        jnp.searchsorted(aligned_end, jnp.maximum(total - 1, 0), side="right").astype(
            jnp.int32
        ),
        e - 1,
    )
    e_tile = jnp.where(tile_valid == 1, e_tile, e_last)
    return src_slot, slot_valid, slot_of_sorted, e_tile, tile_valid


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


def _gmm_swiglu_kernel(vt_ref, ve_ref, lo_ref, hi_ref, li_ref, x_ref, g_ref, u_ref, o_ref, *, bm):
    del li_ref  # consumed by the index_map only (layer-stacked weights)
    v = pl.program_id(0)
    row0 = vt_ref[v] * bm
    ga = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    in_rows = (ga >= lo_ref[v]) & (ga < hi_ref[v])  # [BM, 1]
    x = x_ref[:]
    # Round each GEMM to the compute dtype exactly like the XLA grouped path
    # (ragged_dot/einsum emit bf16) so greedy parity is bit-identical.
    gate = _dot(x, g_ref[0, 0]).astype(x.dtype)
    up = _dot(x, u_ref[0, 0]).astype(x.dtype)
    act = (jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up)
    o_ref[:] = jnp.where(in_rows, act, o_ref[:])


def _gmm_ffn_kernel(
    vt_ref, ve_ref, lo_ref, hi_ref, li_ref, x_ref, g_ref, u_ref, d_ref, o_ref, *, bm
):
    """Fused per-visit expert FFN: gate/up GEMMs + silu + down GEMM in one
    kernel — the [M_pad, I] activation tile never round-trips HBM and the
    visit schedule streams each expert's three weight matrices once in one
    launch instead of two. Rounding points identical to the split
    swiglu+down pair (act is rounded to the compute dtype in VMEM exactly
    where the split path rounded it for the HBM write), so outputs are
    bit-identical. VMEM: 3 x 2.3 MB weight blocks double-buffered ~14 MB —
    fits the 16 MB scoped budget at the real shapes (H=1280, I=896)."""
    del li_ref
    v = pl.program_id(0)
    row0 = vt_ref[v] * bm
    ga = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    in_rows = (ga >= lo_ref[v]) & (ga < hi_ref[v])
    x = x_ref[:]
    gate = _dot(x, g_ref[0, 0]).astype(x.dtype)
    up = _dot(x, u_ref[0, 0]).astype(x.dtype)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    y = _dot(act, d_ref[0, 0]).astype(x.dtype)
    o_ref[:] = jnp.where(in_rows, y, o_ref[:])


def _gmm_swiglu_kernel_al(ve_ref, valid_ref, li_ref, x_ref, g_ref, u_ref, o_ref):
    """Aligned-tile swiglu: one expert per tile — no row mask, no output
    read-modify-write; invalid tail tiles skip the GEMMs entirely."""
    del li_ref
    v = pl.program_id(0)

    @pl.when(valid_ref[v] == 1)
    def _():
        x = x_ref[:]
        gate = _dot(x, g_ref[0, 0]).astype(x.dtype)
        up = _dot(x, u_ref[0, 0]).astype(x.dtype)
        o_ref[:] = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up


def _gmm_down_kernel_al(ve_ref, valid_ref, li_ref, a_ref, d_ref, o_ref):
    v = pl.program_id(0)
    del li_ref

    @pl.when(valid_ref[v] == 1)
    def _():
        a = a_ref[:]
        o_ref[:] = _dot(a, d_ref[0, 0]).astype(a.dtype)


def _gmm_ffn_kernel_al(ve_ref, valid_ref, li_ref, x_ref, g_ref, u_ref, d_ref, o_ref):
    """Aligned-tile fused FFN (swiglu + down in one visit); same rounding
    points as the split pair."""
    del li_ref
    v = pl.program_id(0)

    @pl.when(valid_ref[v] == 1)
    def _():
        x = x_ref[:]
        gate = _dot(x, g_ref[0, 0]).astype(x.dtype)
        up = _dot(x, u_ref[0, 0]).astype(x.dtype)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
        o_ref[:] = _dot(act, d_ref[0, 0]).astype(x.dtype)


def _gmm_aligned_call(
    kernel, e_tile, tile_valid, x, ws, out_dim, *, bm, layer_idx=0, interpret=False
):
    """Shared pallas_call for the aligned-tile kernels. `ws` is the list of
    expert weight stacks; each streams its (li, e_tile[v]) block per tile."""
    s_total, in_dim = x.shape
    n_tiles = s_total // bm
    stacked = [_as_stacked(w, layer_idx) for w in ws]
    li = stacked[0][1]

    def wspec(w4):
        return pl.BlockSpec(
            (1, 1, w4.shape[2], w4.shape[3]),
            lambda v, ve, valid, li: (li[0], ve[v], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (bm, in_dim), lambda v, ve, valid, li: (v, 0), memory_space=pltpu.VMEM
            ),
            *[wspec(w4) for w4, _ in stacked],
        ],
        out_specs=pl.BlockSpec(
            (bm, out_dim), lambda v, ve, valid, li: (v, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_total, out_dim), x.dtype),
        interpret=interpret,
    )(e_tile, tile_valid, li, x, *[w4 for w4, _ in stacked])


def _gmm_ffn_call(
    schedule, x, w_gate, w_up, w_down, *, bm, layer_idx=0, interpret=False
):
    vt, ve, lo, hi = schedule
    m_pad, in_dim = x.shape
    v_total = vt.shape[0]
    w_gate, li = _as_stacked(w_gate, layer_idx)
    w_up, _ = _as_stacked(w_up, layer_idx)
    w_down, _ = _as_stacked(w_down, layer_idx)
    i = w_gate.shape[3]
    h = w_down.shape[3]

    def wspec(inner, outer):
        return pl.BlockSpec(
            (1, 1, inner, outer),
            lambda v, vt, ve, lo, hi, li: (li[0], ve[v], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(v_total,),
        in_specs=[
            pl.BlockSpec(
                (bm, in_dim),
                lambda v, vt, ve, lo, hi, li: (vt[v], 0),
                memory_space=pltpu.VMEM,
            ),
            wspec(in_dim, i),
            wspec(in_dim, i),
            wspec(i, h),
        ],
        out_specs=pl.BlockSpec(
            (bm, h),
            lambda v, vt, ve, lo, hi, li: (vt[v], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_gmm_ffn_kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, h), x.dtype),
        interpret=interpret,
    )(vt, ve, lo, hi, li, x, w_gate, w_up, w_down)


def _gmm_fused_enabled() -> bool:
    """Fused swiglu+down prefill FFN (one kernel per layer, bit-identical;
    saves the [M, I] act HBM round-trip + one launch). DEFAULT ON since r5:
    at M=13.2k/bm=64 (crop-prefill scale) the fused aligned kernel measured
    1.672 ms vs 2.915 split (bench_gmm_bm, 2026-08-21; r4's two jittery
    sessions also mostly favored fused). DEEPSEEK_GMM_FUSED=0 restores the
    split pair."""
    import os

    return os.environ.get("DEEPSEEK_GMM_FUSED", "1") == "1"


def _gmm_down_kernel(vt_ref, ve_ref, lo_ref, hi_ref, li_ref, a_ref, d_ref, o_ref, *, bm):
    del li_ref
    v = pl.program_id(0)
    row0 = vt_ref[v] * bm
    ga = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    in_rows = (ga >= lo_ref[v]) & (ga < hi_ref[v])
    a = a_ref[:]
    y = _dot(a, d_ref[0, 0]).astype(a.dtype)
    o_ref[:] = jnp.where(in_rows, y, o_ref[:])


def _as_stacked(w, layer_idx):
    """Normalize expert weights to the layer-stacked 4D form + [1] i32 index.

    A lax.scan-sliced stacked operand feeding an opaque Pallas call
    materializes a full copy of the layer's experts (~440 MB) every call;
    passing the whole [L, E, ...] stack with the layer index in scalar
    prefetch lets the kernel DMA straight from the stack instead."""
    if w.ndim == 3:
        return w[None], jnp.zeros((1,), jnp.int32)
    return w, jnp.asarray(layer_idx, jnp.int32).reshape(1)


def _gmm_dx_kernel(vt_ref, ve_ref, lo_ref, hi_ref, a_ref, w_ref, o_ref, *, bm):
    """Row-grouped GEMM against the TRANSPOSED expert weight: out = a @ w^T,
    i.e. w [E, O, C] contracted on its last dim — no transposed weight copy
    ever materializes (the MXU contracts either rhs dim)."""
    v = pl.program_id(0)
    row0 = vt_ref[v] * bm
    ga = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    in_rows = (ga >= lo_ref[v]) & (ga < hi_ref[v])
    a = a_ref[:]
    prec = (
        jax.lax.Precision.HIGHEST
        if a.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    y = jax.lax.dot_general(
        a,
        w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(a.dtype)
    o_ref[:] = jnp.where(in_rows, y, o_ref[:])


def _gmm_dx_call(schedule, a, w, *, bm, interpret=False):
    """a [M_pad, C] x w [E, O, C] -> [M_pad, O] (per-group a @ w_e^T)."""
    vt, ve, lo, hi = schedule
    m_pad = a.shape[0]
    v_total = vt.shape[0]
    e, out_dim, in_dim = w.shape
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
                (1, out_dim, in_dim),
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
        functools.partial(_gmm_dx_kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, out_dim), a.dtype),
        interpret=interpret,
    )(vt, ve, lo, hi, a, w)


def _gmm_dw_kernel(
    vt_ref, ve_ref, lo_ref, hi_ref, first_ref, x_ref, dy_ref, o_ref, *, bm
):
    """Per-expert weight gradient: accumulate x_tile^T @ dy_tile (rows
    masked to the visit's group) into the expert's [C, O] block. An
    expert's visits are consecutive in the schedule (groups are contiguous
    in sorted rows), so the out block stays VMEM-resident across its
    visits; `first_ref` marks each expert's first visit (initialize vs
    accumulate). Pad visits target a trash slot (row E)."""
    v = pl.program_id(0)
    row0 = vt_ref[v] * bm
    ga = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    in_rows = (ga >= lo_ref[v]) & (ga < hi_ref[v])
    # Mask BOTH operands: rows outside the group can hold garbage (pad rows
    # of recomputed activations are never written) and 0 * NaN = NaN.
    x = jnp.where(in_rows, x_ref[:], jnp.zeros_like(x_ref))
    dy = jnp.where(in_rows, dy_ref[:], jnp.zeros_like(dy_ref))
    prec = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    dwp = jax.lax.dot_general(
        x,
        dy,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [C, O] f32

    @pl.when(first_ref[v] == 1)
    def _():
        o_ref[0] = dwp

    @pl.when(first_ref[v] == 0)
    def _():
        o_ref[0] = o_ref[0] + dwp


def _gmm_dw_call(schedule, x, dy, e, *, bm, interpret=False):
    """Per-expert dW = sum over group rows of x^T dy. Returns [E, C, O] f32.

    Blocks for experts with zero assignments may be untouched (garbage):
    callers must mask with group_sizes > 0."""
    vt, ve, lo, hi = schedule
    v_total = vt.shape[0]
    c = x.shape[1]
    o = dy.shape[1]
    # Out-block visit order must never revisit a block non-consecutively:
    # route pad/empty visits (lo == hi) to a trash slot (row E).
    pad = lo >= hi
    ve_out = jnp.where(pad, e, ve).astype(jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ve_out[:-1]])
    first = (ve_out != prev).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(v_total,),
        in_specs=[
            pl.BlockSpec(
                (bm, c),
                lambda v, vt, ve, lo, hi, first: (vt[v], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bm, o),
                lambda v, vt, ve, lo, hi, first: (vt[v], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, o),
            lambda v, vt, ve, lo, hi, first: (ve[v], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_gmm_dw_kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e + 1, c, o), jnp.float32),
        interpret=interpret,
    )(vt, ve_out, lo, hi, first, x, dy)
    return out[:e]


def _gmm_call(kernel, schedule, x, w, out_dim, *, bm, layer_idx=0, interpret=False):
    vt, ve, lo, hi = schedule
    m_pad, _ = x.shape
    v_total = vt.shape[0]
    w, li = _as_stacked(w, layer_idx)
    in_dim = w.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(v_total,),
        in_specs=[
            pl.BlockSpec(
                (bm, in_dim),
                lambda v, vt, ve, lo, hi, li: (vt[v], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, in_dim, out_dim),
                lambda v, vt, ve, lo, hi, li: (li[0], ve[v], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, out_dim),
            lambda v, vt, ve, lo, hi, li: (vt[v], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, out_dim), x.dtype),
        interpret=interpret,
    )(vt, ve, lo, hi, li, x, w)


def _gmm_swiglu_call(schedule, x, w_gate, w_up, *, bm, layer_idx=0, interpret=False):
    vt, ve, lo, hi = schedule
    m_pad, in_dim = x.shape
    v_total = vt.shape[0]
    w_gate, li = _as_stacked(w_gate, layer_idx)
    w_up, _ = _as_stacked(w_up, layer_idx)
    i = w_gate.shape[3]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(v_total,),
        in_specs=[
            pl.BlockSpec(
                (bm, in_dim),
                lambda v, vt, ve, lo, hi, li: (vt[v], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, in_dim, i),
                lambda v, vt, ve, lo, hi, li: (li[0], ve[v], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, in_dim, i),
                lambda v, vt, ve, lo, hi, li: (li[0], ve[v], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, i),
            lambda v, vt, ve, lo, hi, li: (vt[v], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_gmm_swiglu_kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, i), x.dtype),
        interpret=interpret,
    )(vt, ve, lo, hi, li, x, w_gate, w_up)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _moe_ffn_gmm_diff(interpret, x_flat, experts, weights, idx, layer_idx):
    return _moe_ffn_gmm_impl(
        x_flat, experts, weights, idx, layer_idx, interpret=interpret
    )


def _moe_ffn_gmm_fwd(interpret, x_flat, experts, weights, idx, layer_idx):
    out = _moe_ffn_gmm_impl(
        x_flat, experts, weights, idx, layer_idx, interpret=interpret
    )
    return out, (x_flat, experts, weights, idx, layer_idx)


def _moe_ffn_gmm_bwd(interpret, res, g):
    """Visit-scheduled Pallas backward (r2 verdict #8: the old XLA-grouped
    VJP routed every backward GEMM through ~5 TF/s ragged_dot).

    Recomputes the sorted pre-activations with 3 forward-style gmm calls
    (cheaper than saving [M, I] residuals), then runs:
    - 3 `dx`-type calls (grouped a @ w_e^T, weights contracted on their
      last dim — no transposed weight copies), and
    - 3 `dw`-type calls (per-expert x^T dy row-contractions accumulated
      in VMEM across each expert's consecutive visits).
    ~3x the forward's weight streams, all at plain-GEMM MXU rates.
    """
    import numpy as np

    x_flat, experts_in, weights, idx, layer_idx = res
    stacked = experts_in["gate"].ndim == 4
    if stacked:
        # Training should run with UNSTACKED experts (scan xs; see
        # models.deepseek_v2.no_prefill_lift) — this slice path keeps the
        # stacked form correct, at the cost of materializing the layer.
        li_s = jnp.asarray(layer_idx, jnp.int32).reshape(())
        experts = {
            k2: jax.lax.dynamic_index_in_dim(v2, li_s, 0, keepdims=False)
            for k2, v2 in experts_in.items()
        }
    else:
        experts = experts_in
    n, h = x_flat.shape
    k = idx.shape[1]
    e, _, i = experts["gate"].shape
    m = n * k
    bm = _pick_bm(m)
    m_pad = -(-m // bm) * bm
    dt = x_flat.dtype

    flat_idx = idx.reshape(m)
    order = jnp.argsort(flat_idx, stable=True)
    token_of = order // k
    x_sorted = jnp.take(x_flat, token_of, axis=0)
    if m_pad != m:
        x_sorted = jnp.pad(x_sorted, ((0, m_pad - m), (0, 0)))
    group_sizes = jnp.bincount(flat_idx, length=e).astype(jnp.int32)
    schedule = _visit_schedule(group_sizes, m_pad, bm)
    call = functools.partial(_gmm_call, bm=bm, interpret=interpret)
    dx_call = functools.partial(_gmm_dx_call, bm=bm, interpret=interpret)
    dw_call = functools.partial(_gmm_dw_call, bm=bm, interpret=interpret)

    # Recompute pre-activations (sorted, padded).
    gate = call(_gmm_down_kernel, schedule, x_sorted, experts["gate"], i)
    up = call(_gmm_down_kernel, schedule, x_sorted, experts["up"], i)
    gate_f = gate.astype(jnp.float32)
    sig = jax.nn.sigmoid(gate_f)
    silu_g = gate_f * sig
    act = silu_g.astype(dt) * up
    y_sorted = call(_gmm_down_kernel, schedule, act, experts["down"], h)

    # Combine backward: out[n] = sum_j w[n,j] * y[n,j] (f32 combine).
    w_sorted = jnp.take(weights.reshape(m).astype(jnp.float32), order)
    g_rows = jnp.take(g.astype(jnp.float32), token_of, axis=0)  # [M, H]
    dy_sorted = (g_rows * w_sorted[:, None]).astype(dt)
    if m_pad != m:
        dy_sorted = jnp.pad(dy_sorted, ((0, m_pad - m), (0, 0)))
    dwt_sorted = jnp.sum(y_sorted[:m].astype(jnp.float32) * g_rows, axis=1)  # [M]
    inv = jnp.argsort(order, stable=True)
    d_weights = jnp.take(dwt_sorted, inv).reshape(n, k).astype(weights.dtype)

    # SwiGLU backward (elementwise in f32; silu'(x) = sig(x)(1 + x(1-sig))).
    dact = dx_call(schedule, dy_sorted, experts["down"])  # [M_pad, I]
    dact_f = dact.astype(jnp.float32)
    dup = (dact_f * silu_g).astype(dt)
    dgate = (dact_f * up.astype(jnp.float32) * (sig * (1.0 + gate_f * (1.0 - sig)))).astype(dt)

    dx_sorted = dx_call(schedule, dgate, experts["gate"]) + dx_call(
        schedule, dup, experts["up"]
    )  # [M_pad, H]
    dx = (
        jnp.zeros((n, h), jnp.float32)
        .at[token_of]
        .add(dx_sorted[:m].astype(jnp.float32))
        .astype(dt)
    )

    mask_e = (group_sizes > 0)[:, None, None]  # untouched dW blocks = garbage
    d_experts = {
        "gate": jnp.where(mask_e, dw_call(schedule, x_sorted, dgate, e), 0.0).astype(
            experts["gate"].dtype
        ),
        "up": jnp.where(mask_e, dw_call(schedule, x_sorted, dup, e), 0.0).astype(
            experts["up"].dtype
        ),
        "down": jnp.where(mask_e, dw_call(schedule, act, dy_sorted, e), 0.0).astype(
            experts["down"].dtype
        ),
    }
    if stacked:
        d_experts = {
            k2: jnp.zeros_like(experts_in[k2]).at[li_s].set(v2.astype(experts_in[k2].dtype))
            for k2, v2 in d_experts.items()
        }
    d_idx = np.zeros(idx.shape, jax.dtypes.float0)  # integer arg: no gradient
    d_li = np.zeros(np.shape(layer_idx), jax.dtypes.float0)
    return dx, d_experts, d_weights, d_idx, d_li


_moe_ffn_gmm_diff.defvjp(_moe_ffn_gmm_fwd, _moe_ffn_gmm_bwd)


def moe_ffn_gmm(
    x_flat: jnp.ndarray,  # [N, H]
    experts: Dict[str, jnp.ndarray],  # gate/up: [(L,) E, H, I], down: [(L,) E, I, H]
    weights: jnp.ndarray,  # [N, k] f32
    idx: jnp.ndarray,  # [N, k] i32
    *,
    layer_idx=0,  # traced i32 when experts are layer-stacked (4D)
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact grouped-GEMM MoE FFN (prefill scale). Returns [N, H] in x dtype.

    Differentiable: forward AND backward run the visit-scheduled Pallas
    kernels (backward as transposed-contraction + per-expert dW calls).
    Layer-stacked form: pass the whole [L, E, ...] stack + layer_idx so a
    scan over layers never slice-copies the stack into the kernel call."""
    return _moe_ffn_gmm_diff(
        interpret, x_flat, experts, weights, idx, jnp.asarray(layer_idx, jnp.int32)
    )


def _moe_ffn_gmm_impl(
    x_flat: jnp.ndarray,
    experts: Dict[str, jnp.ndarray],
    weights: jnp.ndarray,
    idx: jnp.ndarray,
    layer_idx=0,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    n, h = x_flat.shape
    k = idx.shape[1]
    e = experts["gate"].shape[-3]
    m = n * k
    bm = _pick_bm(m)
    m_pad = -(-m // bm) * bm

    flat_idx = idx.reshape(m)
    order = jnp.argsort(flat_idx, stable=True)
    token_of = order // k
    group_sizes = jnp.bincount(flat_idx, length=e).astype(jnp.int32)

    # Expert-aligned slot layout (see _aligned_layout): the sort gather and
    # the aligned scatter compose into ONE row gather straight from x_flat.
    src_slot, slot_valid, slot_of_sorted, e_tile, tile_valid = _aligned_layout(
        group_sizes, m_pad, bm
    )
    token_pad = jnp.concatenate(
        [token_of, jnp.zeros((m_pad - m,), jnp.int32)]
    ) if m_pad != m else token_of
    token_of_slot = jnp.take(token_pad, jnp.clip(src_slot, 0, m_pad - 1))
    x_al = jnp.where(
        slot_valid[:, None], jnp.take(x_flat, token_of_slot, axis=0), 0
    ).astype(x_flat.dtype)

    if _gmm_fused_enabled():
        y_al = _gmm_aligned_call(
            _gmm_ffn_kernel_al, e_tile, tile_valid, x_al,
            [experts["gate"], experts["up"], experts["down"]], h,
            bm=bm, layer_idx=layer_idx, interpret=interpret,
        )
    else:
        act = _gmm_aligned_call(
            _gmm_swiglu_kernel_al, e_tile, tile_valid, x_al,
            [experts["gate"], experts["up"]], experts["gate"].shape[-1],
            bm=bm, layer_idx=layer_idx, interpret=interpret,
        )
        y_al = _gmm_aligned_call(
            _gmm_down_kernel_al, e_tile, tile_valid, act, [experts["down"]], h,
            bm=bm, layer_idx=layer_idx, interpret=interpret,
        )

    # Unsort: row j's selection i lives at slot slot_of_sorted[inv[j*k+i]].
    inv = jnp.argsort(order, stable=True)
    y = jnp.take(y_al, jnp.take(slot_of_sorted, inv), axis=0).reshape(n, k, h)
    out = jnp.sum(y.astype(jnp.float32) * weights[:, :, None], axis=1)
    return out.astype(x_flat.dtype)
