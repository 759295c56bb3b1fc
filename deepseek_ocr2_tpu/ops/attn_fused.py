"""Fused per-layer decode attention: wqkv GEMM -> RoPE -> streaming-softmax
attention over the stacked cache -> wo GEMM, in ONE Pallas launch.

Why: at decode the quantized (w8/w4) unrolled layer loop pays ~3 Pallas
launches per layer (~6 us grid setup each on this backend) plus a chain of
small XLA fusions for RoPE/mask/softmax — together a large slice of the
~720 us int4 b=1 step (weights floor ~405 us). This kernel collapses the
attention block's two projection launches and the XLA attention glue into
one launch per layer:

  - the [B, 3H] qkv projection runs once (first grid step) from the packed
    int4/int8 stream (same slab dots / f32 accumulation as ops/linear_q4 /
    ops/linear_q8, then the same bf16 round-trip the qmm output takes);
  - RoPE rows cos[pos]/sin[pos] arrive precomputed ([B, D], one gather per
    step hoisted out of the layer loop — XLA CSEs it across layers);
  - attention walks the layer's K/V straight from the full stacked pool
    ([L, B, Hh, cap, D], layer index via scalar prefetch — never a layer
    slice copy), one capacity chunk per grid step with a flash softmax,
    the current token folded in as the online-softmax initial state
    (m = s_cur, l = 1, acc = v_new);
  - chunks past a row's position re-point their index_map at the last
    in-budget chunk, so out-of-budget pages are never DMA'd;
  - the wo projection runs once on the assembled [B, H] context at the
    final grid step.

The new token's K/V leave the kernel as outputs; the caller scatters them
into the pool (a one-timestep dynamic_update_slice, exactly like the XLA
pool path — models/deepseek_v2._attention_decode_pool).

Numerics: qkv/wo dots in f32 accumulation with the quant scales folded the
same way as ops/linear_q4 / ops/linear_q8; RoPE and softmax in f32. The
streaming softmax reorders the reduction vs jax.nn.softmax (flash-standard,
same policy as ops/paged_attention); out-of-range keys are -inf (exactly
zero weight) where the XLA path's -1e4 underflows to the same zeros.

Reference parity: this fuses the decode attention of deepseek_v2.rs:319-324,
452-470 (RoPE + cached attention + o_proj); quantization itself is a
beyond-reference serving tier.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear_q4 import _SUB, _dot_default, q4_dot_slabs

NEG_INF = float("-inf")


def fused_attn_enabled() -> bool:
    """Default-on for single-device TPU decode. Off under a multi-device
    process: the kernel carries no sharding rule, so inside a pjit'd mesh
    XLA would all-gather its operands — the per-shard XLA path is the
    correct multi-chip decode (parallel/sharding.py specs)."""
    from .flash_attention import pallas_enabled

    if not pallas_enabled() or len(jax.devices()) > 1:
        return False
    return os.environ.get("DEEPSEEK_FUSED_ATTN", "1") != "0"


def _rot(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _q8_block_dot(x, w_ref, s_ref):
    """Full-block int8 dequant dot (same math as ops/linear_q8's kernel:
    dequant-to-compute-dtype, one f32-accumulated dot, per-column scale)."""
    w = w_ref[:].astype(x.dtype)
    acc = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return acc * s_ref[:]


def _q4_block_dot(x, w_ref, s_ref):
    kp2 = w_ref.shape[0]
    return q4_dot_slabs(
        x,
        lambda j: w_ref[j * _SUB : (j + 1) * _SUB, :],
        lambda g: s_ref[g : g + 1, :],
        kp2 // _SUB,
        _dot_default,
    )


def _fused_kernel(
    # scalar prefetch
    pos_ref,  # [B] i32 — current token's position (== #history keys)
    layer_ref,  # [1] i32
    # inputs
    xn_ref,  # [B, H] compute dtype (post-ln1)
    cos_ref,  # [B, D] f32 rope rows at each row's position
    sin_ref,  # [B, D] f32
    wq_ref,  # packed wqkv (q4: [Kp2, 3H] i8; q8: [K, 3H] i8)
    wqs_ref,  # scales (q4: [Kg, 3H] f32; q8: [1, 3H] f32)
    wo_ref,  # packed wo
    wos_ref,
    k_ref,  # [1, 1, Hh, chunk, D] (layer + chunk via index_map)
    v_ref,
    # outputs
    o_ref,  # [B, H] attn output (post-wo)
    kn_ref,  # [B, Hh*D] new K (RoPE'd, kv dtype) for the caller's pool write
    vn_ref,  # [B, Hh*D]
    # scratch
    qkv_s,  # [B, 3H] f32 (compute-dtype-rounded values)
    q_s,  # [Hh, D] f32 (current row's RoPE'd q)
    m_s,  # [Hh, 1] f32 SMEM
    l_s,  # [Hh, 1] f32 SMEM
    acc_s,  # [Hh, D] f32
    ctx_s,  # [B, H] f32
    rowk_s,  # [1, H] f32 (current row's k, assembled per head)
    rowv_s,  # [1, H] f32
    *,
    scale: float,
    chunk: int,
    n_heads: int,
    head_dim: int,
    hidden: int,
    bits: int,
):
    del layer_ref  # consumed by the index maps only
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    nb = pl.num_programs(0)
    n_chunks = pl.num_programs(1)
    block_dot = _q4_block_dot if bits == 4 else _q8_block_dot

    # Row selection WITHOUT dynamic sublane indexing (Mosaic rejects
    # "dynamic load/store with unaligned indices" on 2D VMEM refs): reads
    # are one-hot sublane reductions, writes one-hot outer-product adds.
    sel_col = (
        jax.lax.broadcasted_iota(jnp.int32, (pl.cdiv(xn_ref.shape[0], 8) * 8, 1), 0)
        == bi
    ).astype(jnp.float32)[: xn_ref.shape[0]]  # [B, 1]

    @pl.when((bi == 0) & (ci == 0))
    def _():
        kn_ref[:] = jnp.zeros_like(kn_ref)
        vn_ref[:] = jnp.zeros_like(vn_ref)
        ctx_s[:] = jnp.zeros_like(ctx_s)
        # One qkv projection for ALL rows; values round-tripped through the
        # compute dtype — the same rounding the qmm output takes unfused.
        acc = block_dot(xn_ref[:], wq_ref, wqs_ref)
        qkv_s[:] = acc.astype(xn_ref.dtype).astype(qkv_s.dtype)

    pos = pos_ref[bi]

    @pl.when(ci == 0)
    def _():
        # Per-row RoPE + online-softmax init from the current token itself.
        qkvr = jnp.sum(sel_col * qkv_s[:], axis=0, keepdims=True)  # [1, 3H]
        cosr = jnp.sum(sel_col * cos_ref[:], axis=0, keepdims=True)  # [1, D]
        sinr = jnp.sum(sel_col * sin_ref[:], axis=0, keepdims=True)
        for hh in range(n_heads):
            lo = hh * head_dim
            qh = qkvr[:, lo : lo + head_dim]
            kh = qkvr[:, hidden + lo : hidden + lo + head_dim]
            vh = qkvr[:, 2 * hidden + lo : 2 * hidden + lo + head_dim]
            qh = qh * cosr + _rot(qh) * sinr
            kh = kh * cosr + _rot(kh) * sinr
            q_s[hh : hh + 1, :] = qh
            rowk_s[:, lo : lo + head_dim] = kh
            rowv_s[:, lo : lo + head_dim] = vh
            s_cur = jnp.sum(qh * kh) * jnp.float32(scale)
            m_s[hh, 0] = s_cur
            l_s[hh, 0] = 1.0
            acc_s[hh : hh + 1, :] = vh
        kn_ref[:] = kn_ref[:] + (sel_col * rowk_s[:]).astype(kn_ref.dtype)
        vn_ref[:] = vn_ref[:] + (sel_col * rowv_s[:]).astype(vn_ref.dtype)

    @pl.when(ci * chunk < pos)
    def _():
        k_pos = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        for hh in range(n_heads):
            kc = k_ref[0, 0, hh].astype(jnp.float32)  # [chunk, D]
            vc = v_ref[0, 0, hh].astype(jnp.float32)
            s = jax.lax.dot_general(
                q_s[hh : hh + 1, :],
                kc,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * jnp.float32(scale)  # [1, chunk]
            s = jnp.where(k_pos < pos, s, jnp.float32(NEG_INF))
            m_old = m_s[hh, 0]
            m_new = jnp.maximum(m_old, jnp.max(s))
            alpha = jnp.exp(m_old - m_new)
            p_ij = jnp.exp(s - m_new)
            l_s[hh, 0] = alpha * l_s[hh, 0] + jnp.sum(p_ij)
            acc_s[hh : hh + 1, :] = acc_s[hh : hh + 1, :] * alpha + jax.lax.dot_general(
                p_ij, vc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_s[hh, 0] = m_new

    @pl.when(ci == n_chunks - 1)
    def _():
        # Assemble the row's context (reusing rowk_s as the staging row),
        # then place it via the one-hot outer add.
        for hh in range(n_heads):
            lo = hh * head_dim
            denom = jnp.maximum(l_s[hh, 0], 1e-37)
            rowk_s[:, lo : lo + head_dim] = acc_s[hh : hh + 1, :] / denom
        ctx_s[:] = ctx_s[:] + sel_col * rowk_s[:]

    @pl.when((bi == nb - 1) & (ci == n_chunks - 1))
    def _():
        # ctx is cast to the compute dtype at the wo dot — the same rounding
        # point as the unfused path's ctx.astype(x.dtype) before qmm.
        acc = block_dot(ctx_s[:].astype(xn_ref.dtype), wo_ref, wos_ref)
        o_ref[:] = acc.astype(o_ref.dtype)


def attn_decode_fused_raw(
    xn: jnp.ndarray,  # [B, H] compute dtype (post-ln1)
    wqkv: Dict[str, jnp.ndarray],  # {"q4"|"q8", "scale"}
    wo: Dict[str, jnp.ndarray],
    k_all: jnp.ndarray,  # [L, B, Hh, cap, D] stacked cache
    v_all: jnp.ndarray,
    layer,  # scalar layer index (python int or traced)
    pos_b: jnp.ndarray,  # [B] i32 current positions
    cos_b: jnp.ndarray,  # [B, D] f32 rope rows
    sin_b: jnp.ndarray,
    *,
    n_heads: int,
    head_dim: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (attn_out [B, H], k_new [B, Hh, D], v_new [B, Hh, D]).

    The caller writes k_new/v_new into the cache at [layer, :, :, pos, :]
    (the kernel already attended over the current token from registers)."""
    b, h = xn.shape
    cap = k_all.shape[3]
    d = head_dim
    bits = 4 if "q4" in wqkv else 8
    wq_pack = wqkv["q4"] if bits == 4 else wqkv["q8"]
    wo_pack = wo["q4"] if bits == 4 else wo["q8"]
    # DEEPSEEK_FUSED_CHUNK ablation: smaller chunks give a (b, n_chunks)
    # grid even at b=1 so the KV DMA pipelines against compute.
    chunk = min(cap, int(os.environ.get("DEEPSEEK_FUSED_CHUNK", "512")))
    assert cap % chunk == 0, (cap, chunk)
    n_chunks = cap // chunk
    scale = 1.0 / math.sqrt(d)

    def kv_spec():
        # Chunks past the row's budget re-point at the last in-budget chunk
        # (same index as the previous grid step -> the DMA is skipped).
        return pl.BlockSpec(
            (1, 1, n_heads, chunk, d),
            lambda bi, ci, pos, ly: (
                ly[0],
                bi,
                0,
                jnp.minimum(ci, jnp.maximum(pos[bi] - 1, 0) // chunk),
                0,
            ),
            memory_space=pltpu.VMEM,
        )

    def const(shape_block):
        return pl.BlockSpec(
            shape_block, lambda bi, ci, pos, ly: (0,) * len(shape_block),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_chunks),
        in_specs=[
            const((b, h)),  # xn
            const((b, d)),  # cos
            const((b, d)),  # sin
            const(wq_pack.shape),  # wqkv pack
            const(wqkv["scale"].shape),  # wqkv scale
            const(wo_pack.shape),  # wo pack
            const(wo["scale"].shape),  # wo scale
            kv_spec(),
            kv_spec(),
        ],
        out_specs=[
            const((b, h)),  # attn out
            const((b, n_heads * d)),  # k_new (reshaped to heads outside)
            const((b, n_heads * d)),  # v_new
        ],
        scratch_shapes=[
            pltpu.VMEM((b, 3 * h), jnp.float32),  # qkv (compute-dtype values)
            pltpu.VMEM((n_heads, d), jnp.float32),  # q (current row)
            pltpu.SMEM((n_heads, 1), jnp.float32),  # m
            pltpu.SMEM((n_heads, 1), jnp.float32),  # l
            pltpu.VMEM((n_heads, d), jnp.float32),  # acc
            pltpu.VMEM((b, h), jnp.float32),  # ctx
            pltpu.VMEM((1, n_heads * d), jnp.float32),  # k/ctx staging row
            pltpu.VMEM((1, n_heads * d), jnp.float32),  # v staging row
        ],
    )
    kernel = functools.partial(
        _fused_kernel,
        scale=scale,
        chunk=chunk,
        n_heads=n_heads,
        head_dim=d,
        hidden=h,
        bits=bits,
    )
    out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h), xn.dtype),
            jax.ShapeDtypeStruct((b, n_heads * d), k_all.dtype),
            jax.ShapeDtypeStruct((b, n_heads * d), v_all.dtype),
        ],
        interpret=interpret,
    )(
        pos_b.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        xn,
        cos_b,
        sin_b,
        wq_pack,
        wqkv["scale"],
        wo_pack,
        wo["scale"],
        k_all,
        v_all,
    )
    k_new = k_new.reshape(b, n_heads, d)
    v_new = v_new.reshape(b, n_heads, d)
    return out, k_new, v_new


def attn_decode_fused(
    xn: jnp.ndarray,  # [B, 1, H]
    attn: Dict,  # {"wqkv": qdict, "wo": qdict}
    cfg,
    cos: jnp.ndarray,  # [max_pos, D] f32 table
    sin: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, B, Hh, cap, D]
    v_all: jnp.ndarray,
    li,
    pos,  # scalar or [B]
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in for the pool decode attention at s==1 with quantized attn
    weights. Returns (attn_out [B, 1, H], k_all, v_all) with the pool
    updated in place (one-timestep write, like _attention_decode_pool)."""
    b, s, h = xn.shape
    assert s == 1
    pos_arr = jnp.asarray(pos, jnp.int32)
    scalar_pos = pos_arr.ndim == 0
    pos_b = jnp.broadcast_to(pos_arr.reshape(-1), (b,))
    # One rope-row gather per step; XLA CSEs this across the 12 layers.
    cos_b = jnp.take(cos, pos_b, axis=0)
    sin_b = jnp.take(sin, pos_b, axis=0)

    out, k_new, v_new = attn_decode_fused_raw(
        xn.reshape(b, h),
        attn["wqkv"],
        attn["wo"],
        k_all,
        v_all,
        li,
        pos_b,
        cos_b,
        sin_b,
        n_heads=cfg.num_attention_heads,
        head_dim=cfg.head_dim,
        interpret=interpret,
    )

    li = jnp.asarray(li, jnp.int32)
    if scalar_pos:
        k_all = jax.lax.dynamic_update_slice(
            k_all, k_new[None, :, :, None, :], (li, 0, 0, pos_arr, 0)
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, v_new[None, :, :, None, :], (li, 0, 0, pos_arr, 0)
        )
    else:
        rows = jnp.arange(b)
        k_all = k_all.at[li, rows, :, pos_b, :].set(k_new)
        v_all = v_all.at[li, rows, :, pos_b, :].set(v_new)
    return out.reshape(b, 1, h), k_all, v_all
