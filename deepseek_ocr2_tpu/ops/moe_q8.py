"""Weight-only int8 MoE decode — fused Pallas dequant + SwiGLU kernel.

Decode is bandwidth-bound on expert weights (~41 MB/layer at bf16). Plain XLA
`convert(int8) -> dot` recovers almost nothing (~9%: the dequant serializes
with the matmul). This kernel streams each selected expert's int8 fused
gate||up and down blocks from HBM via scalar-prefetched expert ids — Pallas
double-buffers consecutive grid steps, so the next expert's DMA overlaps the
current expert's dequant+matmul — and computes the whole SwiGLU in VMEM.

Quantization: symmetric per-output-channel int8 (scale = absmax/127 over the
input dim). Opt-in (quantize_experts); greedy parity tests always run the
bf16 path.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_per_col(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., In, Out] -> (int8 same shape, f32 scales [..., 1, Out])."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_experts(experts: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Quantize a (possibly layer-stacked) expert dict for the q8 decode path.

    Input keys gate/up: [..., E, H, I], down: [..., E, I, H]. Output keys:
    gu_q8 int8 [..., E, H, 2I] (gate||up fused along the output axis — one
    weight stream per expert instead of two, so the kernel's DMA pipeline
    runs fewer, larger transfers), gu_scale f32 [..., E, 1, 2I], down_q8,
    down_scale. Per-output-column quantization is unchanged by the concat.
    """
    out: Dict[str, jnp.ndarray] = {}
    gu = jnp.concatenate([experts["gate"], experts["up"]], axis=-1)
    out["gu_q8"], out["gu_scale"] = quantize_per_col(gu)
    out["down_q8"], out["down_scale"] = quantize_per_col(experts["down"])
    return out


def _q8_kernel(
    # scalar prefetch
    idx_ref,  # [B, K] i32 selected expert ids
    wts_ref,  # [B, K] f32 combine weights
    # inputs
    x_ref,  # [B, H] (whole batch; row selected in kernel)
    gu_ref,  # [1, H, 2I] int8 (gate||up fused)
    gus_ref,  # [1, 1, 2I] f32
    d_ref,  # [1, I, H] int8
    ds_ref,  # [1, 1, H] f32
    # output
    o_ref,  # [B, H] f32
):
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
    ).astype(x_ref.dtype)  # [1, H]

    # Pin dot precision: the global "highest" setting (used by the CPU parity
    # tests) lowers bf16 dots to multi-pass forms Mosaic rejects for
    # int8-converted operands.
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    gu = gu_ref[0].astype(x.dtype)  # dequant-to-compute dtype in VMEM
    i = gu.shape[-1] // 2
    h2 = dot(x, gu) * gus_ref[0]  # [1, 2I]
    gate, up = h2[:, :i], h2[:, i:]
    act = (jax.nn.silu(gate) * up).astype(x.dtype)  # [1, I]
    d = d_ref[0].astype(x.dtype)
    y = dot(act, d) * ds_ref[0]  # [1, H]
    o_ref[:] = o_ref[:] + jnp.where(row_mask, y * wts_ref[b, k], 0.0)


def _q8_pe_kernel(
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
    visits per row (combine weight 1). Only dispatched at b=1: at larger b
    the pe streams would be re-read once per row."""
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
    ).astype(x_ref.dtype)  # [1, H]

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    def swiglu(gu_r, gus_r, d_r, ds_r):
        gu = gu_r[0].astype(x.dtype)
        i = gu.shape[-1] // 2
        h2 = dot(x, gu) * gus_r[0]
        gate, up = h2[:, :i], h2[:, i:]
        act = (jax.nn.silu(gate) * up).astype(x.dtype)
        return dot(act, d_r[0].astype(x.dtype)) * ds_r[0]  # [1, H]

    @pl.when(ki < k)
    def _():
        y = swiglu(gu_ref, gus_ref, d_ref, ds_ref)
        o_ref[:] = o_ref[:] + jnp.where(row_mask, y * wts_ref[b, ki], 0.0)

    @pl.when(ki >= k)
    def _():
        y = swiglu(pgu_ref, pgus_ref, pd_ref, pds_ref)
        o_ref[:] = o_ref[:] + jnp.where(row_mask, y, 0.0)


def moe_ffn_decode_q8(
    x_flat: jnp.ndarray,  # [B, H] (bf16)
    experts_q8: Dict[str, jnp.ndarray],  # gate_q8 [E,H,I] i8, gate_scale [E,1,I] f32, ...
    weights: jnp.ndarray,  # [B, K] f32
    idx: jnp.ndarray,  # [B, K] i32
    *,
    with_shared: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8 MoE decode FFN. Returns [B, H] in x dtype.

    with_shared=True folds the shared pseudo-expert streams (pe_* keys) in
    as n_sh extra always-on visits per row; the caller must not add a
    separate shared term. Latency-path only (see _q8_pe_kernel)."""
    b, h = x_flat.shape
    k = idx.shape[1]
    e, _, i2 = experts_q8["gu_q8"].shape
    i = i2 // 2

    if with_shared:
        n_sh = experts_q8["pe_gu_q8"].shape[0]
        pev = jnp.concatenate(
            [jnp.zeros((k,), jnp.int32), jnp.arange(n_sh, dtype=jnp.int32)]
        )
        km1 = k - 1

        def eidx(bi, ki, pev, idx, wts):
            return idx[bi, jnp.minimum(ki, km1)]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, k + n_sh),
            in_specs=[
                pl.BlockSpec(
                    (b, h), lambda bi, ki, pev, idx, wts: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, h, i2),
                    lambda bi, ki, pev, idx, wts: (eidx(bi, ki, pev, idx, wts), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, i2),
                    lambda bi, ki, pev, idx, wts: (eidx(bi, ki, pev, idx, wts), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, i, h),
                    lambda bi, ki, pev, idx, wts: (eidx(bi, ki, pev, idx, wts), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, h),
                    lambda bi, ki, pev, idx, wts: (eidx(bi, ki, pev, idx, wts), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, h, i2),
                    lambda bi, ki, pev, idx, wts: (pev[ki], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, i2),
                    lambda bi, ki, pev, idx, wts: (pev[ki], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, i, h),
                    lambda bi, ki, pev, idx, wts: (pev[ki], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, h),
                    lambda bi, ki, pev, idx, wts: (pev[ki], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (b, h), lambda bi, ki, pev, idx, wts: (0, 0), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            functools.partial(_q8_pe_kernel, k),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
            interpret=interpret,
        )(
            pev,
            idx.astype(jnp.int32),
            weights.astype(jnp.float32),
            x_flat,
            experts_q8["gu_q8"],
            experts_q8["gu_scale"],
            experts_q8["down_q8"],
            experts_q8["down_scale"],
            experts_q8["pe_gu_q8"],
            experts_q8["pe_gu_scale"],
            experts_q8["pe_down_q8"],
            experts_q8["pe_down_scale"],
        )
        return out.astype(x_flat.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec((b, h), lambda bi, ki, idx, wts: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h, i2), lambda bi, ki, idx, wts: (idx[bi, ki], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, i2), lambda bi, ki, idx, wts: (idx[bi, ki], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, i, h), lambda bi, ki, idx, wts: (idx[bi, ki], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, h), lambda bi, ki, idx, wts: (idx[bi, ki], 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, h), lambda bi, ki, idx, wts: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _q8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        weights.astype(jnp.float32),
        x_flat,
        experts_q8["gu_q8"],
        experts_q8["gu_scale"],
        experts_q8["down_q8"],
        experts_q8["down_scale"],
    )
    return out.astype(x_flat.dtype)


def moe_ffn_decode_q8_xla(x_flat, experts_q8, weights, idx):
    """XLA reference for the q8 path (same math: dequant to x dtype, SwiGLU)."""
    b, h = x_flat.shape
    k = idx.shape[1]
    acc = jnp.zeros((b, h), jnp.float32)
    i2 = experts_q8["gu_q8"].shape[2]
    i = i2 // 2
    for t in range(b):
        x_t = x_flat[t : t + 1]
        for j in range(k):
            ex = idx[t, j]
            gu = jax.lax.dynamic_slice(experts_q8["gu_q8"], (ex, 0, 0), (1, h, i2))[0]
            gus = jax.lax.dynamic_slice(experts_q8["gu_scale"], (ex, 0, 0), (1, 1, i2))[0]
            d = jax.lax.dynamic_slice(experts_q8["down_q8"], (ex, 0, 0), (1, i, h))[0]
            ds = jax.lax.dynamic_slice(experts_q8["down_scale"], (ex, 0, 0), (1, 1, h))[0]
            h2 = (x_t @ gu.astype(x_flat.dtype)).astype(jnp.float32) * gus
            gate, up = h2[:, :i], h2[:, i:]
            act = (jax.nn.silu(gate) * up).astype(x_flat.dtype)
            y = (act @ d.astype(x_flat.dtype)).astype(jnp.float32) * ds
            acc = acc.at[t].add(y[0] * weights[t, j])
    return acc.astype(x_flat.dtype)
