"""Weight-only int4 (w4a16) linear — fused Pallas nibble-unpack + matmul.

int4 halves the int8 path's weight DMA; decode at batch<=32 is bandwidth
bound on weight bytes, so w4 raises the decode ceiling again (hardware
probe: lm_head [1280, 129280] b=1 kernel 188 us q4 vs 319 us q8, 1.70x).
The cost is an in-kernel nibble unpack on the VPU: Mosaic only lowers
shifts on i32 vectors, so the unpack widens each packed slab to i32 — the
kernel unpacks in 128-row sub-slabs inside an unrolled loop to bound the
i32 temporaries while the weight-block DMA stays large.

Packing — block-local split-half: the input dim is zero-padded to a
multiple of 256 and split into 256-row blocks; packed byte row r of block
j holds original row 256j+r in the low nibble and 256j+128+r in the high
nibble. Both halves of every unpacked slab are contiguous 128-lane slices
of x (no sublane interleave, which Mosaic rejects), and any shard cut at a
multiple of 128 packed rows is self-contained — so the packed axis can be
row-sharded under TP exactly like the int8 tensors.

Quantization — symmetric int4, levels [-7, 7], with GROUP-WISE scales
(one f32 scale per 128 input rows per output column, the GPTQ/AWQ-style
granularity): at 4 bits a whole-column absmax costs real accuracy, while
group scales add ~1.5% bytes. The kernels fold the group scales into the
per-slab partial products (one VPU multiply per slab), so there is no
post-dot rescale pass.

Opt-in (quantize_lm_params(..., bits=4)); greedy parity vs the torch
oracles is pinned on the bf16 path, and the q4 path carries its own
kernel==XLA and logit-error tests. Reference parity note: the reference
has no quantization at all (weights are f32/f16, main.rs:1361-1385); this
is a beyond-reference serving optimization.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QLinear4 = Dict[str, jnp.ndarray]  # {"q4": i8 [Kp/2, Out], "scale": f32 [Kp/128, Out]}

_BLK = 256  # original rows per packed block (two 128-row halves)
_SUB = 128  # packed rows per in-kernel unpack slab (= _BLK // 2)
_GRP = 128  # input rows per scale group (one group per slab half)


def pack_q4(q: jnp.ndarray) -> jnp.ndarray:
    """int32 levels [-7,7], [Kp, ...] with Kp % 256 == 0 -> packed int8
    [Kp/2, ...] in block-local split-half OFFSET-LO order: the low nibble
    stores lo+8 (offset-binary), the high nibble stores hi (two's
    complement). With a sign-extended i8 view v this gives the identity
        v == 16*hi + (lo + 8)
    exactly, which lets the kernels recover BOTH halves from two MXU dots
    on v and (v >> 4) with no low-nibble shift pair — 4 VPU ops per packed
    byte instead of 6 (the unpack is the VPU wall of the int4 decode step,
    docs/DESIGN.md round-5 ledger)."""
    kp = q.shape[0]
    rest = q.shape[1:]
    qb = q.reshape(kp // _BLK, 2, _SUB, *rest)
    lo, hi = qb[:, 0] + 8, qb[:, 1]
    packed = (lo & 0xF) | ((hi & 0xF) << 4)  # 0..255 in int32
    packed = jax.lax.bitcast_convert_type(packed.astype(jnp.uint8), jnp.int8)
    return packed.reshape(kp // 2, *rest)


def unpack_q4(packed_i32: jnp.ndarray):
    """SIGN-EXTENDED i32 view of packed bytes (i.e. `packed_i8.astype(i32)`,
    NOT `& 0xFF`-masked) -> (lo, hi) int4 values in i32.

    Offset-lo format (see pack_q4): hi is one arithmetic shift (bit 7 sign
    fills bits 8..31 under the sign-extended widen); lo is the masked low
    nibble minus the +8 offset. XLA/dequant path only — the kernels use the
    v = 16*hi + (lo+8) dot identity in q4_dot_slabs instead of unpacking."""
    lo = (packed_i32 & 0xF) - 8
    hi = jax.lax.shift_right_arithmetic(packed_i32, 4)
    return lo, hi


def quantize_q4_grouped(w: jnp.ndarray):
    """[..., In, Out] -> (packed int8 [..., Inp/2, Out], f32 scales
    [..., Inp/128, Out]). Inp = In zero-padded to a multiple of 256."""
    *lead, k, n = w.shape
    pad = (-k) % _BLK
    if pad:
        w = jnp.pad(w, [(0, 0)] * len(lead) + [(0, pad), (0, 0)])
    kp = w.shape[-2]
    wf = w.astype(jnp.float32).reshape(*lead, kp // _GRP, _GRP, n)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(*lead, kp, n)
    scale = scale.reshape(*lead, kp // _GRP, n).astype(jnp.float32)
    if lead:
        packed = jax.vmap(pack_q4)(q.reshape(-1, kp, n)).reshape(*lead, kp // 2, n)
    else:
        packed = pack_q4(q)
    return packed, scale


def quantize_linear_q4(w: jnp.ndarray) -> QLinear4:
    """[In, Out] weight -> {"q4", "scale"} (block-local split-half packed,
    group-128 scales). See module docstring for the layout."""
    q4, scale = quantize_q4_grouped(w)
    return {"q4": q4, "scale": scale}


def is_qlinear4(w) -> bool:
    return isinstance(w, dict) and "q4" in w


def dequantize_q4(q4: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Packed [..., Kp/2, Out] + scales [..., Kp/128, Out] -> [..., Kp, Out]."""
    *lead, kp2, n = q4.shape
    kp = 2 * kp2
    p32 = q4.astype(jnp.int32)  # sign-extended widen (unpack_q4 contract)
    p32 = p32.reshape(*lead, kp // _BLK, _SUB, n)
    lo, hi = unpack_q4(p32)
    q = jnp.stack([lo, hi], axis=-3).reshape(*lead, kp // _GRP, _GRP, n)
    wf = q.astype(jnp.float32) * scale[..., :, None, :]
    return wf.reshape(*lead, kp, n).astype(dtype)


def _pad_x_q4(x: jnp.ndarray, kp: int) -> jnp.ndarray:
    if x.shape[-1] == kp:
        return x
    return jnp.pad(x, ((0, 0), (0, kp - x.shape[-1])))


def q4_dot_slabs(x, w_slabs, s_slabs, n_slabs: int, dot):
    """Shared unpack-and-accumulate body: x [B, 2*SUB*n_slabs] in compute
    dtype, w_slabs(j) -> [SUB, Out] i8 slab, s_slabs(g) -> [1, Out] f32
    group scale row. Returns the f32 [B, Out] partial sum with group scales
    folded per slab.

    Offset-lo math (pack_q4): sign-extended byte v = 16*hi + (lo+8), so
        x_lo . lo = x_lo . v - 16*(x_lo . hi) - 8*rowsum(x_lo)
    Only 4 VPU ops per packed byte (i8->dtype convert of v; widen+shift+
    convert for hi) versus 6 for a full nibble unpack — measured -7..37%
    on the unpack-bound b=1 decode kernels (scripts/bench_q4_overlap.py,
    bench_q4_offlo_ab.py). When the row count is sublane-aligned (B % 8)
    the two hi dots share one stacked [2B, SUB] MXU pass, matching the
    legacy scheme's 2 passes per slab; at small unaligned B the row split
    of the stacked result would be Mosaic-illegal, so hi runs as two dots
    (cheap there: dot cost is operand-load-bound, not row-bound)."""
    b = x.shape[0]
    stacked = b % 8 == 0
    acc = None
    for j in range(n_slabs):
        w = w_slabs(j)
        v_c = w.astype(x.dtype)
        h_c = jax.lax.shift_right_arithmetic(w.astype(jnp.int32), 4).astype(x.dtype)
        o = 2 * j * _SUB
        x_lo = x[:, o : o + _SUB]
        x_hi = x[:, o + _SUB : o + 2 * _SUB]
        rs = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
        if stacked:
            d2 = dot(jnp.concatenate([x_lo, x_hi], axis=0), h_c)
            d_hlo, d_hhi = d2[:b], d2[b:]
        else:
            d_hlo, d_hhi = dot(x_lo, h_c), dot(x_hi, h_c)
        t = (dot(x_lo, v_c) - 16.0 * d_hlo - 8.0 * rs) * s_slabs(2 * j)
        t = t + d_hhi * s_slabs(2 * j + 1)
        acc = t if acc is None else acc + t
    return acc


def _dot_default(a, b):
    # Precision pinned to DEFAULT: the global "highest" setting lowers bf16
    # dots to multi-pass forms Mosaic rejects (same trap as ops/moe_q8.py).
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _q4_linear_kernel(x_ref, w_ref, s_ref, o_ref):
    """Output-column-blocked: one grid step owns an [Kp/2, block_o] packed
    block (wide weights, e.g. lm_head / wqkv / gate||up)."""
    x = x_ref[:]
    kp2 = w_ref.shape[0]
    o_ref[:] = q4_dot_slabs(
        x,
        lambda j: w_ref[j * _SUB : (j + 1) * _SUB, :],
        lambda g: s_ref[g : g + 1, :],
        kp2 // _SUB,
        _dot_default,
    )


def _q4_linear_kernel_kblocked(x_ref, w_ref, s_ref, o_ref):
    """Contraction-blocked accumulating variant for tall weights (e.g. the
    dense down-projection): each weight block is a contiguous row slab
    (column blocks of a narrow matrix degrade the DMA to strided chunks).
    Scales ride a [n_blocks, groups_per_block, Out] view so each grid step's
    scale block keeps full trailing dims (Mosaic tiling rule)."""
    ki = pl.program_id(0)
    x = x_ref[:]  # [B, 2*block_k2] — contiguous original rows of this block
    bk2 = w_ref.shape[0]
    acc = q4_dot_slabs(
        x,
        lambda j: w_ref[j * _SUB : (j + 1) * _SUB, :],
        lambda g: s_ref[0, g : g + 1, :],
        bk2 // _SUB,
        _dot_default,
    )

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] = o_ref[:] + acc


def _pick_block_o(kp2: int, out_dim: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    bo = max(128, (budget_bytes // kp2) // 128 * 128)
    return min(out_dim, bo)


def _pick_block_k2(kp2: int, out_dim: int, budget_bytes: int = 4 * 1024 * 1024):
    """Packed-row block height for tall weights: must divide kp2 evenly and
    be a multiple of 128 (slab alignment). None if no such split fits."""
    n_min = max(1, -(-kp2 * out_dim // budget_bytes))
    for n in range(n_min, kp2 // _SUB + 1):
        if kp2 % n == 0 and (kp2 // n) % _SUB == 0:
            return kp2 // n
    return None


def linear_q4(
    x: jnp.ndarray,  # [B, In] (bf16/f32), B small (decode batch)
    w: QLinear4,
    *,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int4 linear: (x @ dequant(w)). Returns [B, Out] in out_dtype
    (default x.dtype); f32 accumulation, group scales folded per slab.

    Wide weights stream output-column blocks of the packed matrix; tall
    weights (In >= 2*Out) stream contiguous contraction slabs instead
    (same DMA-shape rule as ops/linear_q8.linear_q8)."""
    kp2, out_dim = w["q4"].shape
    kp = 2 * kp2
    x = _pad_x_q4(x, kp)
    b = x.shape[0]
    block_k2 = _pick_block_k2(kp2, out_dim) if kp >= 2 * out_dim else None
    if block_k2 is not None and block_k2 < kp2:
        nk = kp2 // block_k2
        gpb = 2 * block_k2 // _GRP  # scale groups per block
        s3 = w["scale"].reshape(nk, gpb, out_dim)
        out = pl.pallas_call(
            _q4_linear_kernel_kblocked,
            grid=(nk,),
            in_specs=[
                pl.BlockSpec((b, 2 * block_k2), lambda ki: (0, ki), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (block_k2, out_dim), lambda ki: (ki, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, gpb, out_dim), lambda ki: (ki, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((b, out_dim), lambda ki: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
            interpret=interpret,
        )(x, w["q4"], s3)
        return out.astype(out_dtype or x.dtype)
    block_o = _pick_block_o(kp2, out_dim)
    grid = (pl.cdiv(out_dim, block_o),)
    out = pl.pallas_call(
        _q4_linear_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, kp), lambda oi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp2, block_o), lambda oi: (0, oi), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // _GRP, block_o), lambda oi: (0, oi), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_o), lambda oi: (0, oi), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
        interpret=interpret,
    )(x, w["q4"], w["scale"])
    return out.astype(out_dtype or x.dtype)


def linear_q4_xla(x: jnp.ndarray, w: QLinear4, *, out_dtype=None) -> jnp.ndarray:
    """XLA path, same math as the kernel (dequant to x dtype, f32 accum,
    one dot — group scaling happens at dequant). Used for prefill (many
    rows: compute-bound) and as the correctness oracle / CPU fallback."""
    kp = 2 * w["q4"].shape[0]
    x = _pad_x_q4(x, kp)
    wd = dequantize_q4(w["q4"], w["scale"], dtype=x.dtype)
    acc = jax.lax.dot_general(
        x,
        wd,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc.astype(out_dtype or x.dtype)
