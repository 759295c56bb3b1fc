"""int4 b=1 overlap experiments (VERDICT r5 #1).

Hypotheses from the r4 bill (bench_q4_bound: DMA-floor + VPU unpack run
ADDITIVELY in the MoE and fused-attention kernels):
  (a) MoE with_shared streams TWO full expert streams per grid step
      (~3.7 MB blocks) — over Mosaic's double-buffer budget, forcing
      single-buffering. Test: single-stream kernel with pe experts
      appended into the expert tensor (E=66, 8 selections).
  (b) raising vmem_limit_bytes lets Mosaic double-buffer the dual-stream
      kernel. Test: same call under DEEPSEEK_Q4_VMEM_MB.
  (c) fused attention at b=1 cap<=512 is a single grid step — nothing to
      pipeline. Test: DEEPSEEK_FUSED_CHUNK ablation (128 vs 512).
  (d) offset-lo packing (lo stored +8): one raw-byte dot + one hi-shift
      dot = 4 VPU ops/byte instead of 6. Test: local kernel variant on the
      wqkv wide shape.

Run on an idle TPU, canary first. Difference-method timing throughout.
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
    quantize_linear_q4,
    quantize_q4_grouped,
)
from deepseek_ocr2_tpu.ops.moe_q4 import moe_ffn_decode_q4, quantize_experts_q4

H, I, E, K, NSH = 1280, 896, 64, 6, 2


def _bytes_of(d):
    return sum(int(v.size) * v.dtype.itemsize for v in d.values())


# ---------------------------------------------------------------- offset-lo
def pack_q4_offlo(q):
    """Same block-local split-half layout, but the low nibble stores lo+8."""
    kp = q.shape[0]
    qb = q.reshape(kp // 256, 2, 128, *q.shape[1:])
    lo, hi = qb[:, 0] + 8, qb[:, 1]
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    packed = jax.lax.bitcast_convert_type(packed.astype(jnp.uint8), jnp.int8)
    return packed.reshape(kp // 2, *q.shape[1:])


def q4_dot_slabs_offlo(x, w_slabs, s_slabs, n_slabs, dot):
    """Offset-lo scheme: byte v (sign-extended) = 16*hi + (lo+8).
    dot(x_lo, lo) = dot(x_lo, v) - 16*dot(x_lo, hi) - 8*rowsum(x_lo).
    VPU ops per byte: i8->bf16 convert (v), widen+shift+convert (hi) = 4."""
    acc = None
    for j in range(n_slabs):
        w = w_slabs(j)  # [SUB, Out] i8
        v_c = w.astype(x.dtype)  # direct i8 -> compute dtype
        h_c = jax.lax.shift_right_arithmetic(w.astype(jnp.int32), 4).astype(x.dtype)
        o = 2 * j * _SUB
        x_lo = x[:, o : o + _SUB]
        x_hi = x[:, o + _SUB : o + 2 * _SUB]
        d_v = dot(x_lo, v_c)
        d_hlo = dot(x_lo, h_c)
        d_hhi = dot(x_hi, h_c)
        rs = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
        t = (d_v - 16.0 * d_hlo - 8.0 * rs) * s_slabs(2 * j) + d_hhi * s_slabs(2 * j + 1)
        acc = t if acc is None else acc + t
    return acc


def _offlo_kernel(x_ref, w_ref, s_ref, o_ref):
    kp2 = w_ref.shape[0]
    o_ref[:] = q4_dot_slabs_offlo(
        x_ref[:],
        lambda j: w_ref[j * _SUB : (j + 1) * _SUB, :],
        lambda g: s_ref[g : g + 1, :],
        kp2 // _SUB,
        _dot_default,
    )


def linear_q4_offlo(x, q4o, scale):
    kp2, out_dim = q4o.shape
    kp = 2 * kp2
    b = x.shape[0]
    return pl.pallas_call(
        _offlo_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp2, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // _GRP, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
    )(x, q4o, scale)


def _cur_kernel_1grid(x_ref, w_ref, s_ref, o_ref):
    from deepseek_ocr2_tpu.ops.linear_q4 import q4_dot_slabs

    kp2 = w_ref.shape[0]
    o_ref[:] = q4_dot_slabs(
        x_ref[:],
        lambda j: w_ref[j * _SUB : (j + 1) * _SUB, :],
        lambda g: s_ref[g : g + 1, :],
        kp2 // _SUB,
        _dot_default,
    )


def linear_q4_cur_1grid(x, q4p, scale):
    kp2, out_dim = q4p.shape
    kp = 2 * kp2
    b = x.shape[0]
    return pl.pallas_call(
        _cur_kernel_1grid,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp2, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // _GRP, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
    )(x, q4p, scale)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- canary
    w = jnp.asarray(rng.standard_normal((H, 129280)) * 0.02, jnp.float32)
    q4h = quantize_linear_q4(w)
    xc = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    t = time_chain(chain(lambda x: linear_q4(x, q4h)), xc)
    print(f"canary lm_head b=1: {t*1e6:7.1f} us ({'CLEAN' if t*1e6 < 125 else 'DIRTY'})", flush=True)
    del w, q4h

    # ---- (d) offset-lo on the wqkv wide shape [1280, 3840], b=1, 1 grid step
    wq = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.02, jnp.float32)
    q4w = quantize_linear_q4(wq)
    # offset-lo repack from the same int levels
    qlev = jnp.clip(
        jnp.round(
            wq.reshape(10, 128, 3 * H)
            / jnp.maximum(jnp.max(jnp.abs(wq.reshape(10, 128, 3 * H)), 1, keepdims=True), 1e-8)
            * 7.0
        ),
        -7,
        7,
    ).astype(jnp.int32).reshape(H, 3 * H)
    q4o = pack_q4_offlo(qlev)
    x = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)

    # numerics check offlo vs current on same levels
    q4cur = {"q4": q4w["q4"], "scale": q4w["scale"]}
    got_cur = np.asarray(linear_q4_cur_1grid(x, q4cur["q4"], q4cur["scale"]))
    # rebuild offlo from the SAME quantize (use q4w scale + its levels)
    from deepseek_ocr2_tpu.ops.linear_q4 import dequantize_q4

    lev_cur = np.asarray(dequantize_q4(q4w["q4"], jnp.ones_like(q4w["scale"])))  # int levels
    q4o_same = pack_q4_offlo(jnp.asarray(lev_cur, jnp.int32))
    got_off = np.asarray(linear_q4_offlo(x, q4o_same, q4w["scale"]))
    err = np.abs(got_cur - got_off).max() / (np.abs(got_cur).max() + 1e-9)
    print(f"offlo numerics vs current: rel err {err:.2e}", flush=True)

    nb = _bytes_of(q4w)
    t = time_chain(chain(lambda x: linear_q4_cur_1grid(x, q4cur["q4"], q4cur["scale"])), x, iters_lo=64, iters_hi=512)
    print(f"wqkv wide b=1 CURRENT (3-shift): {t*1e6:7.1f} us  {nb/t/1e9:6.1f} GB/s", flush=True)
    t = time_chain(chain(lambda x: linear_q4_offlo(x, q4o_same, q4w["scale"])), x, iters_lo=64, iters_hi=512)
    print(f"wqkv wide b=1 OFFSET-LO       : {t*1e6:7.1f} us  {nb/t/1e9:6.1f} GB/s", flush=True)

    # ---- (a) MoE dual-stream vs single-stream (pe appended)
    experts = {
        "gate": jnp.asarray(rng.standard_normal((E, H, I)) * 0.02, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((E, H, I)) * 0.02, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((E, I, H)) * 0.02, jnp.float32),
    }
    eq = quantize_experts_q4(experts)
    pe = {
        "gate": experts["gate"][:NSH],
        "up": experts["up"][:NSH],
        "down": experts["down"][:NSH],
    }
    peq = quantize_experts_q4(pe)
    eq_dual = dict(eq)
    eq_dual.update({f"pe_{k}": v for k, v in peq.items()})

    experts_app = {k: jnp.concatenate([experts[k], pe[k]], 0) for k in experts}
    eq_app = quantize_experts_q4(experts_app)

    xm = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, E, (1, K)), jnp.int32)
    wts = jnp.asarray(rng.random((1, K)), jnp.float32)
    idx_app = jnp.concatenate([idx, jnp.asarray([[E, E + 1]], jnp.int32)], 1)
    wts_app = jnp.concatenate([wts, jnp.ones((1, NSH), jnp.float32)], 1)

    per_visit = _bytes_of(eq) / E
    nb8 = per_visit * (K + NSH)
    t = time_chain(
        chain(lambda x: moe_ffn_decode_q4(x, eq_dual, wts, idx, with_shared=True)), xm, iters_lo=64, iters_hi=512
    )
    print(f"moe b=1 DUAL-STREAM (shipping): {t*1e6:7.1f} us  {nb8/t/1e9:6.1f} GB/s", flush=True)
    t = time_chain(
        chain(lambda x: moe_ffn_decode_q4(x, eq_app, wts_app, idx_app)), xm, iters_lo=64, iters_hi=512
    )
    print(f"moe b=1 SINGLE-STREAM (pe appended): {t*1e6:7.1f} us  {nb8/t/1e9:6.1f} GB/s", flush=True)

    # sanity: same result
    a = np.asarray(moe_ffn_decode_q4(xm, eq_dual, wts, idx, with_shared=True), np.float32)
    b = np.asarray(moe_ffn_decode_q4(xm, eq_app, wts_app, idx_app), np.float32)
    print(f"dual vs appended rel err: {np.abs(a-b).max()/(np.abs(a).max()+1e-9):.2e}", flush=True)


if __name__ == "__main__":
    main()
