"""Batched-decode MoE — fused distinct-expert-visit Pallas kernels.

At serving batch sizes (b*k > E) every expert is usually selected by someone,
so decode reads the whole expert set each step and the floor is the expert
weight bytes. The XLA dense path (`moe.moe_ffn_dense`) pays ~2.4x that floor:
the einsum lowers to E skinny batched GEMMs with [N,E,I] intermediates
round-tripping through HBM (measured 19.2 ms/step at b=32 vs the ~8 ms byte
floor, scripts/bench_decode_pieces.py / docs/DESIGN.md). The per-selection
int8 kernel (`moe_q8.moe_ffn_decode_q8`) is worse at this scale: b*k visits
re-read shared experts (b=32,k=6 -> 192 visits ~ 3x the distinct bytes).

These kernels visit each *distinct* selected expert exactly once:

- the visit list is the sorted distinct expert ids, padded to a static E
  entries by repeating the last distinct id — repeated block indices make the
  Pallas pipeline skip the redundant weight DMA, and a prefetched validity
  flag skips the compute, so pad visits cost ~nothing;
- each visit processes the ENTIRE batch against that expert's weights: rows
  that did not select the expert get a zero combine weight (`w_visit`, a
  scatter of the routing weights into a dense [V, B] table built outside the
  kernel), so no row gather/scatter is needed and output accumulation stays
  resident in VMEM (f32) across all visits;
- bf16 weights (3 x H x I x 2 B ~ 6.9 MB/expert) exceed half of VMEM when
  double-buffered, so the bf16 kernel splits the expert intermediate dim in
  two (grid (2, E), s-major: per s all visits run back-to-back, keeping the
  pad-visit DMA-skip effective) and accumulates the down-projection halves;
  the int8 variant (3.4 MB/expert) runs a single visit grid.

Numerics: GEMMs rounded to the compute dtype at the same points as the XLA
dense path, silu in f32, combine in f32 (HF expert summation — the combine
is a sum over experts in visit order = ascending id, matching `moe_infer`).
Replaces the reference's direct per-expert decode loop
(deepseek_v2.rs:669-698) at TPU serving batch sizes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .moe_gmm import _dot


def _distinct_schedule(idx: jnp.ndarray, e: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distinct selected experts, ascending, padded to E by repeating the last.

    Returns (ve [E] i32 visit expert ids, valid [E] i32 1-for-real-visit).
    """
    flat = idx.reshape(-1)
    counts = jnp.bincount(flat, length=e)
    present = counts > 0
    ids = jnp.arange(e, dtype=jnp.int32)
    ve_sorted = jnp.sort(jnp.where(present, ids, e))  # distinct first, then E
    n_distinct = jnp.sum(present.astype(jnp.int32))
    last = ve_sorted[jnp.maximum(n_distinct - 1, 0)]
    ve = jnp.where(ve_sorted == e, last, ve_sorted).astype(jnp.int32)
    valid = (ids < n_distinct).astype(jnp.int32)
    return ve, valid


def _combine_table(
    idx: jnp.ndarray,  # [B, K] i32
    weights: jnp.ndarray,  # [B, K] f32
    ve: jnp.ndarray,  # [V] i32
    valid: jnp.ndarray,  # [V] i32
    e: int,
    b_pad: int,
) -> jnp.ndarray:
    """Dense per-(visit, row) combine weights [V, B_pad, 1] f32."""
    b = idx.shape[0]
    w_full = jnp.zeros((e, b), jnp.float32)
    w_full = w_full.at[idx, jnp.arange(b, dtype=jnp.int32)[:, None]].add(
        weights.astype(jnp.float32)
    )
    w_visit = jnp.take(w_full, ve, axis=0) * valid[:, None].astype(jnp.float32)
    if b_pad != b:
        w_visit = jnp.pad(w_visit, ((0, 0), (0, b_pad - b)))
    return w_visit[:, :, None]


def _decode_kernel(
    li_ref, ve_ref, valid_ref, x_ref, g_ref, u_ref, d_ref, w_ref, o_ref, gacc_ref, uacc_ref
):
    """Visit-major grid (E, n_s): sub-step s consumes the s-th contraction
    (H) chunk of gate/up; `down` is one full block fetched once per visit.
    Gate/up partial products accumulate in f32 scratch — identical rounding
    to XLA's single bf16 dot (f32 accumulation over K, rounded once)."""
    v = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    h_chunk = g_ref.shape[2]

    @pl.when((v == 0) & (s == 0))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(valid_ref[v] == 1)
    def _():
        # n_s <= 2: static lane slices per sub-step (Mosaic-friendly).
        @pl.when(s == 0)
        def _():
            xs = x_ref[:, :h_chunk]
            gacc_ref[:] = _dot(xs, g_ref[0, 0])  # f32 [B, I]
            uacc_ref[:] = _dot(xs, u_ref[0, 0])

        @pl.when(s > 0)
        def _():
            xs = x_ref[:, x_ref.shape[1] - h_chunk :]
            gacc_ref[:] = gacc_ref[:] + _dot(xs, g_ref[0, 0])
            uacc_ref[:] = uacc_ref[:] + _dot(xs, u_ref[0, 0])

        @pl.when(s == n_s - 1)
        def _():
            dtype = x_ref.dtype
            gate = gacc_ref[:].astype(dtype)  # round like the XLA bf16 dot
            up = uacc_ref[:].astype(dtype)
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(dtype) * up
            y = _dot(act, d_ref[0, 0])  # f32 [B, H]
            o_ref[:] = o_ref[:] + y * w_ref[0]


def moe_ffn_decode_fused(
    x_flat: jnp.ndarray,  # [B, H]
    experts: Dict[str, jnp.ndarray],  # gate/up: [(L,) E, H, I], down: [(L,) E, I, H]
    weights: jnp.ndarray,  # [B, K] f32
    idx: jnp.ndarray,  # [B, K] i32
    *,
    layer_idx=None,  # traced i32 scalar when experts are layer-stacked
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused distinct-expert batched-decode MoE FFN. Returns [B, H] in x dtype.

    Layer-stacked form: pass the WHOLE [L, E, ...] expert stack plus a
    traced `layer_idx` — the kernel indexes the stack via scalar prefetch,
    so a lax.scan over layers never slices the stack (a scan-sliced operand
    feeding an opaque custom call would materialize a ~440 MB copy per
    layer per step; cf. quantize_lm_params' per-layer storage note)."""
    b, h = x_flat.shape
    if experts["gate"].ndim == 3:
        experts = {k: v[None] for k, v in experts.items()}  # free reshape
        layer_idx = 0
    assert layer_idx is not None, "layer_idx required for stacked experts"
    li = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    _, e, _, i = experts["gate"].shape
    # Contraction split keeps the per-step weight working set (~2 x H/2 x I
    # + I x H) inside VMEM with double-buffering; needs sublane-aligned
    # chunks (full expert fits anyway for tiny test configs).
    n_s = 2 if (h % 2 == 0 and (h // 2) % 8 == 0 and h * i * 2 * 3 > 4 << 20) else 1
    h_chunk = h // n_s

    b_pad = -(-b // 16) * 16  # bf16 sublane tile
    x = x_flat if b_pad == b else jnp.pad(x_flat, ((0, b_pad - b), (0, 0)))
    ve, valid = _distinct_schedule(idx, e)
    w_visit = _combine_table(idx, weights, ve, valid, e, b_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(e, n_s),
        in_specs=[
            pl.BlockSpec(
                (b_pad, h),
                lambda v, s, li, ve, valid: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h_chunk, i),
                lambda v, s, li, ve, valid: (li[0], ve[v], s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h_chunk, i),
                lambda v, s, li, ve, valid: (li[0], ve[v], s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, i, h),
                lambda v, s, li, ve, valid: (li[0], ve[v], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, b_pad, 1),
                lambda v, s, li, ve, valid: (v, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, h),
            lambda v, s, li, ve, valid: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, i), jnp.float32),
            pltpu.VMEM((b_pad, i), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _decode_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, h), jnp.float32),
        interpret=interpret,
    )(li, ve, valid, x, experts["gate"], experts["up"], experts["down"], w_visit)
    return out[:b].astype(x_flat.dtype)


def _q8_swiglu_accum(x_ref, gu_ref, gus_ref, d_ref, ds_ref, w_ref, o_ref):
    x = x_ref[:]
    gu = gu_ref[0].astype(x.dtype)  # dequant-to-compute dtype in VMEM
    i = gu.shape[-1] // 2
    h2 = _dot(x, gu) * gus_ref[0]  # f32 [B, 2I]
    gate, up = h2[:, :i], h2[:, i:]
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    y = _dot(act, d_ref[0].astype(x.dtype)) * ds_ref[0]  # f32 [B, H]
    o_ref[:] = o_ref[:] + y * w_ref[0]


def _decode_q8_kernel(ve_ref, valid_ref, x_ref, gu_ref, gus_ref, d_ref, ds_ref, w_ref, o_ref):
    v = pl.program_id(0)

    @pl.when(v == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(valid_ref[v] == 1)
    def _():
        _q8_swiglu_accum(x_ref, gu_ref, gus_ref, d_ref, ds_ref, w_ref, o_ref)


def _decode_q8_pe_kernel(
    e,  # static: number of real experts (visits >= e are shared pseudo-experts)
    pev_ref,
    ve_ref,
    valid_ref,
    x_ref,
    gu_ref,
    gus_ref,
    d_ref,
    ds_ref,
    pgu_ref,
    pgus_ref,
    pd_ref,
    pds_ref,
    w_ref,
    o_ref,
):
    """Distinct-expert visits plus trailing always-on shared pseudo-expert
    visits; the shared stream rides the same double-buffered pipeline."""
    v = pl.program_id(0)

    @pl.when(v == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when((v < e) & (valid_ref[v] == 1))
    def _():
        _q8_swiglu_accum(x_ref, gu_ref, gus_ref, d_ref, ds_ref, w_ref, o_ref)

    @pl.when(v >= e)
    def _():
        _q8_swiglu_accum(x_ref, pgu_ref, pgus_ref, pd_ref, pds_ref, w_ref, o_ref)


def moe_ffn_decode_q8_fused(
    x_flat: jnp.ndarray,  # [B, H]
    experts_q8: Dict[str, jnp.ndarray],  # gu_q8 [E,H,2I] i8, gu_scale, down_q8, down_scale
    weights: jnp.ndarray,  # [B, K] f32
    idx: jnp.ndarray,  # [B, K] i32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int8 distinct-expert batched-decode MoE FFN (same math as
    moe_q8.moe_ffn_decode_q8, one visit per distinct expert instead of one
    per (token, selection)).

    When `experts_q8` carries shared pseudo-expert streams (pe_* keys from
    quantize_lm_params), the shared MLP is folded in as n_sh trailing
    always-on visits with combine weight 1 and the caller must NOT add a
    separate shared term.
    """
    import functools

    b, h = x_flat.shape
    e, _, i2 = experts_q8["gu_q8"].shape
    i = i2 // 2
    n_sh = experts_q8["pe_gu_q8"].shape[0] if "pe_gu_q8" in experts_q8 else 0

    b_pad = -(-b // 16) * 16
    x = x_flat if b_pad == b else jnp.pad(x_flat, ((0, b_pad - b), (0, 0)))
    ve, valid = _distinct_schedule(idx, e)
    w_visit = _combine_table(idx, weights, ve, valid, e, b_pad)

    if n_sh:
        # Trailing pe visits: repeat the last real visit's expert id so the
        # (unused) expert-stream DMA is index-skipped; w rows are 1 for real
        # batch rows, 0 for sublane padding.
        ve = jnp.concatenate([ve, jnp.broadcast_to(ve[e - 1], (n_sh,))])
        valid = jnp.concatenate([valid, jnp.zeros((n_sh,), jnp.int32)])
        pe_w = (jnp.arange(b_pad) < b).astype(jnp.float32)[None, :, None]
        w_visit = jnp.concatenate([w_visit, jnp.broadcast_to(pe_w, (n_sh, b_pad, 1))])
        pev = jnp.concatenate(
            [jnp.zeros((e,), jnp.int32), jnp.arange(n_sh, dtype=jnp.int32)]
        )
        pe_specs = [
            pl.BlockSpec(
                (1, h, i2), lambda v, pev, ve, valid: (pev[v], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, i2), lambda v, pev, ve, valid: (pev[v], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, i, h), lambda v, pev, ve, valid: (pev[v], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, h), lambda v, pev, ve, valid: (pev[v], 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(e + n_sh,),
            in_specs=[
                pl.BlockSpec(
                    (b_pad, h), lambda v, pev, ve, valid: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, h, i2),
                    lambda v, pev, ve, valid: (ve[v], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, i2),
                    lambda v, pev, ve, valid: (ve[v], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, i, h),
                    lambda v, pev, ve, valid: (ve[v], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, h),
                    lambda v, pev, ve, valid: (ve[v], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *pe_specs,
                pl.BlockSpec(
                    (1, b_pad, 1),
                    lambda v, pev, ve, valid: (v, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (b_pad, h), lambda v, pev, ve, valid: (0, 0), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            functools.partial(_decode_q8_pe_kernel, e),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b_pad, h), jnp.float32),
            interpret=interpret,
        )(
            pev,
            ve,
            valid,
            x,
            experts_q8["gu_q8"],
            experts_q8["gu_scale"],
            experts_q8["down_q8"],
            experts_q8["down_scale"],
            experts_q8["pe_gu_q8"],
            experts_q8["pe_gu_scale"],
            experts_q8["pe_down_q8"],
            experts_q8["pe_down_scale"],
            w_visit,
        )
        return out[:b].astype(x_flat.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e,),
        in_specs=[
            pl.BlockSpec(
                (b_pad, h), lambda v, ve, valid: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, h, i2), lambda v, ve, valid: (ve[v], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, i2), lambda v, ve, valid: (ve[v], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, i, h), lambda v, ve, valid: (ve[v], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, h), lambda v, ve, valid: (ve[v], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, b_pad, 1), lambda v, ve, valid: (v, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, h), lambda v, ve, valid: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _decode_q8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, h), jnp.float32),
        interpret=interpret,
    )(
        ve,
        valid,
        x,
        experts_q8["gu_q8"],
        experts_q8["gu_scale"],
        experts_q8["down_q8"],
        experts_q8["down_scale"],
        w_visit,
    )
    return out[:b].astype(x_flat.dtype)
