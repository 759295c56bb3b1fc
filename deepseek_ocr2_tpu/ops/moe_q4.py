"""Weight-only int4 MoE decode — fused Pallas nibble-unpack + SwiGLU kernels.

int4 halves the int8 expert stream (the majority of decode-step weight
bytes: ~6 routed x 41 MB/2 + shared 13 MB/2 per MoE layer at int8). The
kernels mirror the proven int8 pair (ops/moe_q8.moe_ffn_decode_q8 for the
b=1 latency path, ops/moe_decode.moe_ffn_decode_q8_fused for batched
decode: one visit per *distinct* selected expert), swapping the in-VMEM
int8 convert for the block-local split-half nibble unpack + group-128
scales of ops/linear_q4 (see that module's docstring for the layout).

Contraction dims pad to a multiple of 256 (H for gate||up, I for down);
the wrappers pad x to match and the kernels zero-pad the activation before
the down dot. Output dims never pad, so results are exact-width.

Opt-in via quantize_lm_params(..., bits=4); same shared-pseudo-expert
(pe_*) folding contract as the int8 path. Reference parity note: the
reference has no quantization (main.rs:1361-1385); beyond-reference.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear_q4 import (
    _BLK,
    _GRP,
    _SUB,
    _dot_default,
    dequantize_q4,
    q4_dot_slabs,
    quantize_q4_grouped,
)
from .moe_decode import _combine_table, _distinct_schedule


def quantize_experts_q4(experts: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Quantize an expert dict for the q4 decode path.

    Input keys gate/up: [E, H, I], down: [E, I, H]. Output: gu_q4 int8
    [E, Hp/2, 2I] (gate||up fused along the output axis, H block-local
    split-half packed), gu_scale f32 [E, Hp/128, 2I], down_q4 [E, Ip/2, H],
    down_scale [E, Ip/128, H]."""
    gu = jnp.concatenate([experts["gate"], experts["up"]], axis=-1)
    out: Dict[str, jnp.ndarray] = {}
    out["gu_q4"], out["gu_scale"] = quantize_q4_grouped(gu)
    out["down_q4"], out["down_scale"] = quantize_q4_grouped(experts["down"])
    return out


def dequantize_experts_q4(q4: Dict[str, jnp.ndarray], dtype, i: int, h: int):
    """Rebuild gate/up/down (original unpadded dims) for the XLA MoE paths."""
    gu = dequantize_q4(q4["gu_q4"], q4["gu_scale"], dtype)[..., :h, :]
    i2 = gu.shape[-1]
    down = dequantize_q4(q4["down_q4"], q4["down_scale"], dtype)[..., :i, :]
    return {"gate": gu[..., : i2 // 2], "up": gu[..., i2 // 2 :], "down": down}


def _pad_cols(x: jnp.ndarray, width: int) -> jnp.ndarray:
    if x.shape[-1] == width:
        return x
    return jnp.pad(x, ((0, 0), (0, width - x.shape[-1])))


def _q4_swiglu(x, gu_ref, gus_ref, d_ref, ds_ref):
    """One expert's SwiGLU from q4 refs. x: [B, Hp] compute dtype (padded);
    returns f32 [B, H]. silu in f32 (reference HF numerics)."""
    hp2 = gu_ref.shape[1]
    h2 = q4_dot_slabs(
        x,
        lambda j: gu_ref[0, j * _SUB : (j + 1) * _SUB, :],
        lambda g: gus_ref[0, g : g + 1, :],
        hp2 // _SUB,
        _dot_default,
    )  # f32 [B, 2I]
    i = h2.shape[-1] // 2
    gate, up = h2[:, :i], h2[:, i:]
    act = (jax.nn.silu(gate) * up).astype(x.dtype)  # [B, I]
    ip = 2 * d_ref.shape[1]
    if ip != i:
        act = jnp.concatenate(
            [act, jnp.zeros((act.shape[0], ip - i), act.dtype)], axis=1
        )
    return q4_dot_slabs(
        act,
        lambda j: d_ref[0, j * _SUB : (j + 1) * _SUB, :],
        lambda g: ds_ref[0, g : g + 1, :],
        (ip // 2) // _SUB,
        _dot_default,
    )  # f32 [B, H]


# ------------------------------------------------- per-selection (latency)
def _q4_kernel(idx_ref, wts_ref, x_ref, gu_ref, gus_ref, d_ref, ds_ref, o_ref):
    b = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when((k == 0) & (b == 0))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # Row-select via masking (Mosaic cannot prove dynamic sublane alignment).
    n_rows = x_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    row_mask = row_ids == b
    x = jnp.sum(
        jnp.where(row_mask, x_ref[:].astype(jnp.float32), 0.0), axis=0, keepdims=True
    ).astype(x_ref.dtype)  # [1, Hp]

    y = _q4_swiglu(x, gu_ref, gus_ref, d_ref, ds_ref)
    o_ref[:] = o_ref[:] + jnp.where(row_mask, y * wts_ref[b, k], 0.0)


def _q4_pe_kernel(
    k,  # static: selections per row (grid steps >= k are shared pseudo-experts)
    pev_ref,
    idx_ref,
    wts_ref,
    x_ref,
    gu_ref,
    gus_ref,
    d_ref,
    ds_ref,
    pgu_ref,
    pgus_ref,
    pd_ref,
    pds_ref,
    o_ref,
):
    """Per-selection visits plus trailing always-on shared pseudo-expert
    visits per row (combine weight 1). Only dispatched at b=1 — same
    contract as moe_q8._q8_pe_kernel."""
    b = pl.program_id(0)
    ki = pl.program_id(1)

    @pl.when((ki == 0) & (b == 0))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    n_rows = x_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    row_mask = row_ids == b
    x = jnp.sum(
        jnp.where(row_mask, x_ref[:].astype(jnp.float32), 0.0), axis=0, keepdims=True
    ).astype(x_ref.dtype)

    @pl.when(ki < k)
    def _():
        y = _q4_swiglu(x, gu_ref, gus_ref, d_ref, ds_ref)
        o_ref[:] = o_ref[:] + jnp.where(row_mask, y * wts_ref[b, ki], 0.0)

    @pl.when(ki >= k)
    def _():
        y = _q4_swiglu(x, pgu_ref, pgus_ref, pd_ref, pds_ref)
        o_ref[:] = o_ref[:] + jnp.where(row_mask, y, 0.0)


def moe_ffn_decode_q4(
    x_flat: jnp.ndarray,  # [B, H] (bf16)
    experts_q4: Dict[str, jnp.ndarray],
    weights: jnp.ndarray,  # [B, K] f32
    idx: jnp.ndarray,  # [B, K] i32
    *,
    with_shared: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int4 MoE decode FFN (one visit per (row, selection)).
    Returns [B, H] in x dtype. with_shared folds the pe_* shared streams in
    as always-on trailing visits (b=1 latency path)."""
    b, h = x_flat.shape
    k = idx.shape[1]
    e, hp2, i2 = experts_q4["gu_q4"].shape
    gg = experts_q4["gu_scale"].shape[1]
    ip2, _ = experts_q4["down_q4"].shape[1:]
    dg = experts_q4["down_scale"].shape[1]
    x = _pad_cols(x_flat, 2 * hp2)

    def gu_specs(eidx):
        return [
            pl.BlockSpec((1, hp2, i2), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gg, i2), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ip2, h), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, h), eidx, memory_space=pltpu.VMEM),
        ]

    if with_shared:
        n_sh = experts_q4["pe_gu_q4"].shape[0]
        pev = jnp.concatenate(
            [jnp.zeros((k,), jnp.int32), jnp.arange(n_sh, dtype=jnp.int32)]
        )
        km1 = k - 1

        def sel(bi, ki, pev, idx, wts):
            return (idx[bi, jnp.minimum(ki, km1)], 0, 0)

        def pe(bi, ki, pev, idx, wts):
            return (pev[ki], 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, k + n_sh),
            in_specs=[
                pl.BlockSpec(
                    (b, 2 * hp2),
                    lambda bi, ki, pev, idx, wts: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *gu_specs(sel),
                *gu_specs(pe),
            ],
            out_specs=pl.BlockSpec(
                (b, h), lambda bi, ki, pev, idx, wts: (0, 0), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            functools.partial(_q4_pe_kernel, k),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
            interpret=interpret,
        )(
            pev,
            idx.astype(jnp.int32),
            weights.astype(jnp.float32),
            x,
            experts_q4["gu_q4"],
            experts_q4["gu_scale"],
            experts_q4["down_q4"],
            experts_q4["down_scale"],
            experts_q4["pe_gu_q4"],
            experts_q4["pe_gu_scale"],
            experts_q4["pe_down_q4"],
            experts_q4["pe_down_scale"],
        )
        return out.astype(x_flat.dtype)

    def sel2(bi, ki, idx, wts):
        return (idx[bi, ki], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec(
                (b, 2 * hp2), lambda bi, ki, idx, wts: (0, 0), memory_space=pltpu.VMEM
            ),
            *gu_specs(sel2),
        ],
        out_specs=pl.BlockSpec(
            (b, h), lambda bi, ki, idx, wts: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _q4_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        weights.astype(jnp.float32),
        x,
        experts_q4["gu_q4"],
        experts_q4["gu_scale"],
        experts_q4["down_q4"],
        experts_q4["down_scale"],
    )
    return out.astype(x_flat.dtype)


# ------------------------------------------ distinct-expert visits (batched)
def _q4_accum(x_ref, gu_ref, gus_ref, d_ref, ds_ref, w_ref, o_ref):
    y = _q4_swiglu(x_ref[:], gu_ref, gus_ref, d_ref, ds_ref)
    o_ref[:] = o_ref[:] + y * w_ref[0]


def _decode_q4_kernel(ve_ref, valid_ref, x_ref, gu_ref, gus_ref, d_ref, ds_ref, w_ref, o_ref):
    v = pl.program_id(0)

    @pl.when(v == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(valid_ref[v] == 1)
    def _():
        _q4_accum(x_ref, gu_ref, gus_ref, d_ref, ds_ref, w_ref, o_ref)


def _decode_q4_pe_kernel(
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
    v = pl.program_id(0)

    @pl.when(v == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when((v < e) & (valid_ref[v] == 1))
    def _():
        _q4_accum(x_ref, gu_ref, gus_ref, d_ref, ds_ref, w_ref, o_ref)

    @pl.when(v >= e)
    def _():
        _q4_accum(x_ref, pgu_ref, pgus_ref, pd_ref, pds_ref, w_ref, o_ref)


def moe_ffn_decode_q4_fused(
    x_flat: jnp.ndarray,  # [B, H]
    experts_q4: Dict[str, jnp.ndarray],
    weights: jnp.ndarray,  # [B, K] f32
    idx: jnp.ndarray,  # [B, K] i32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int4 distinct-expert batched-decode MoE FFN (one visit per distinct
    selected expert; pe_* shared streams fold in as trailing always-on
    visits — same contract as ops/moe_decode.moe_ffn_decode_q8_fused)."""
    b, h = x_flat.shape
    e, hp2, i2 = experts_q4["gu_q4"].shape
    gg = experts_q4["gu_scale"].shape[1]
    ip2 = experts_q4["down_q4"].shape[1]
    dg = experts_q4["down_scale"].shape[1]
    n_sh = experts_q4["pe_gu_q4"].shape[0] if "pe_gu_q4" in experts_q4 else 0

    b_pad = -(-b // 16) * 16
    x = x_flat if b_pad == b else jnp.pad(x_flat, ((0, b_pad - b), (0, 0)))
    x = _pad_cols(x, 2 * hp2)
    ve, valid = _distinct_schedule(idx, e)
    w_visit = _combine_table(idx, weights, ve, valid, e, b_pad)

    def estreams(eidx):
        return [
            pl.BlockSpec((1, hp2, i2), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gg, i2), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ip2, h), eidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, h), eidx, memory_space=pltpu.VMEM),
        ]

    if n_sh:
        ve = jnp.concatenate([ve, jnp.broadcast_to(ve[e - 1], (n_sh,))])
        valid = jnp.concatenate([valid, jnp.zeros((n_sh,), jnp.int32)])
        pe_w = (jnp.arange(b_pad) < b).astype(jnp.float32)[None, :, None]
        w_visit = jnp.concatenate([w_visit, jnp.broadcast_to(pe_w, (n_sh, b_pad, 1))])
        pev = jnp.concatenate(
            [jnp.zeros((e,), jnp.int32), jnp.arange(n_sh, dtype=jnp.int32)]
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(e + n_sh,),
            in_specs=[
                pl.BlockSpec(
                    (b_pad, 2 * hp2),
                    lambda v, pev, ve, valid: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *estreams(lambda v, pev, ve, valid: (ve[v], 0, 0)),
                *estreams(lambda v, pev, ve, valid: (pev[v], 0, 0)),
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
            functools.partial(_decode_q4_pe_kernel, e),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b_pad, h), jnp.float32),
            interpret=interpret,
        )(
            pev,
            ve,
            valid,
            x,
            experts_q4["gu_q4"],
            experts_q4["gu_scale"],
            experts_q4["down_q4"],
            experts_q4["down_scale"],
            experts_q4["pe_gu_q4"],
            experts_q4["pe_gu_scale"],
            experts_q4["pe_down_q4"],
            experts_q4["pe_down_scale"],
            w_visit,
        )
        return out[:b].astype(x_flat.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e,),
        in_specs=[
            pl.BlockSpec(
                (b_pad, 2 * hp2), lambda v, ve, valid: (0, 0), memory_space=pltpu.VMEM
            ),
            *estreams(lambda v, ve, valid: (ve[v], 0, 0)),
            pl.BlockSpec(
                (1, b_pad, 1), lambda v, ve, valid: (v, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, h), lambda v, ve, valid: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _decode_q4_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, h), jnp.float32),
        interpret=interpret,
    )(
        ve,
        valid,
        x,
        experts_q4["gu_q4"],
        experts_q4["gu_scale"],
        experts_q4["down_q4"],
        experts_q4["down_scale"],
        w_visit,
    )
    return out[:b].astype(x_flat.dtype)


def moe_ffn_decode_q4_xla(x_flat, experts_q4, weights, idx):
    """XLA reference for the q4 path (dequant per selected expert, SwiGLU)."""
    b, h = x_flat.shape
    k = idx.shape[1]
    hp2, i2 = experts_q4["gu_q4"].shape[1:]
    ip2 = experts_q4["down_q4"].shape[1]
    gg = experts_q4["gu_scale"].shape[1]
    dg = experts_q4["down_scale"].shape[1]
    i = i2 // 2
    xp = _pad_cols(x_flat, 2 * hp2)
    acc = jnp.zeros((b, h), jnp.float32)
    for t in range(b):
        x_t = xp[t : t + 1]
        for j in range(k):
            ex = idx[t, j]
            gu4 = jax.lax.dynamic_slice(experts_q4["gu_q4"], (ex, 0, 0), (1, hp2, i2))
            gus = jax.lax.dynamic_slice(experts_q4["gu_scale"], (ex, 0, 0), (1, gg, i2))
            d4 = jax.lax.dynamic_slice(experts_q4["down_q4"], (ex, 0, 0), (1, ip2, h))
            ds = jax.lax.dynamic_slice(experts_q4["down_scale"], (ex, 0, 0), (1, dg, h))
            gu = dequantize_q4(gu4[0], gus[0], x_flat.dtype)
            h2 = (x_t @ gu).astype(jnp.float32)
            gate, up = h2[:, :i], h2[:, i:]
            act = (jax.nn.silu(gate) * up).astype(x_flat.dtype)
            act = _pad_cols(act, 2 * ip2)
            d = dequantize_q4(d4[0], ds[0], x_flat.dtype)
            y = (act @ d).astype(jnp.float32)
            acc = acc.at[t].add(y[0] * weights[t, j])
    return acc.astype(x_flat.dtype)
