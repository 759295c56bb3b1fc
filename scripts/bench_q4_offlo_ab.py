"""Within-process A/B: offset-lo (shipping) vs legacy 3-shift q4 math.

Times the REAL kernels (fused decode attention, MoE decode with shared
visits, lm_head wide) at decode shapes in one process, swapping
q4_dot_slabs + the pack format between variants. Run on an idle TPU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import chain, time_chain  # noqa: E402

import deepseek_ocr2_tpu.ops.attn_fused as af
import deepseek_ocr2_tpu.ops.linear_q4 as lq4
import deepseek_ocr2_tpu.ops.moe_q4 as mq4

H, I, E, K, NSH = 1280, 896, 64, 6, 2
HEADS, D = 10, 128
CAP = 512


def q4_dot_slabs_3shift(x, w_slabs, s_slabs, n_slabs, dot):
    """Legacy math: full nibble unpack (3 shifts + 2 converts per byte)."""
    acc = None
    for j in range(n_slabs):
        p32 = w_slabs(j).astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
        hi = jax.lax.shift_right_arithmetic(p32, 4)
        o = 2 * j * lq4._SUB
        t = dot(x[:, o : o + lq4._SUB], lo.astype(x.dtype)) * s_slabs(2 * j)
        t = t + dot(x[:, o + lq4._SUB : o + 2 * lq4._SUB], hi.astype(x.dtype)) * s_slabs(
            2 * j + 1
        )
        acc = t if acc is None else acc + t
    return acc


def repack_legacy(q4packed):
    """Shipping offset-lo bytes -> legacy two's-complement-nibble bytes."""
    v = q4packed.astype(jnp.int32)
    lo = (v & 0xF) - 8
    hi = jax.lax.shift_right_arithmetic(v, 4)
    out = (lo & 0xF) | ((hi & 0xF) << 4)
    return jax.lax.bitcast_convert_type(out.astype(jnp.uint8), jnp.int8)


def set_math(legacy: bool):
    fn = q4_dot_slabs_3shift if legacy else lq4.q4_dot_slabs
    mq4.q4_dot_slabs = fn
    af.q4_dot_slabs = fn


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    orig = lq4.q4_dot_slabs

    # canary + lm_head A/B
    w = jnp.asarray(rng.standard_normal((H, 129280)) * 0.02, jnp.float32)
    q4h = lq4.quantize_linear_q4(w)
    q4h_leg = {"q4": repack_legacy(q4h["q4"]), "scale": q4h["scale"]}
    xc = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    t = time_chain(chain(lambda x: lq4.linear_q4(x, q4h)), xc)
    print(f"lm_head b=1 OFFLO : {t*1e6:7.1f} us (canary; clean if <125)", flush=True)
    lq4.q4_dot_slabs = q4_dot_slabs_3shift
    try:
        t = time_chain(chain(lambda x: lq4.linear_q4(x, q4h_leg)), xc)
    finally:
        lq4.q4_dot_slabs = orig
    print(f"lm_head b=1 LEGACY: {t*1e6:7.1f} us", flush=True)
    del w, q4h, q4h_leg

    # fused attention A/B at b=1 and b=8
    wq = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.02, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.float32)
    wqkv = lq4.quantize_linear_q4(wq)
    wod = lq4.quantize_linear_q4(wo)
    wqkv_leg = {"q4": repack_legacy(wqkv["q4"]), "scale": wqkv["scale"]}
    wod_leg = {"q4": repack_legacy(wod["q4"]), "scale": wod["scale"]}
    for b in (1, 8):
        k_all = jnp.asarray(
            rng.standard_normal((1, b, HEADS, CAP, D)) * 0.1, jnp.bfloat16
        )
        v_all = jnp.asarray(
            rng.standard_normal((1, b, HEADS, CAP, D)) * 0.1, jnp.bfloat16
        )
        xn = jnp.asarray(rng.standard_normal((b, H)) * 0.5, jnp.bfloat16)
        pos_b = jnp.full((b,), 300, jnp.int32)
        cos_b = jnp.ones((b, D), jnp.float32)
        sin_b = jnp.zeros((b, D), jnp.float32)

        def run_attn(x, wq_, wo_):
            out, kn, vn = af.attn_decode_fused_raw(
                x, wq_, wo_, k_all, v_all, 0, pos_b, cos_b, sin_b,
                n_heads=HEADS, head_dim=D,
            )
            return out

        set_math(False)
        t = time_chain(chain(lambda x: run_attn(x, wqkv, wod)), xn, iters_lo=64, iters_hi=512)
        print(f"fused_attn b={b} OFFLO : {t*1e6:7.1f} us/layer", flush=True)
        set_math(True)
        try:
            t = time_chain(
                chain(lambda x: run_attn(x, wqkv_leg, wod_leg)), xn, iters_lo=64, iters_hi=512
            )
        finally:
            set_math(False)
        print(f"fused_attn b={b} LEGACY: {t*1e6:7.1f} us/layer", flush=True)

    # MoE A/B (with_shared b=1; fused distinct b=8)
    experts = {
        "gate": jnp.asarray(rng.standard_normal((E, H, I)) * 0.02, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((E, H, I)) * 0.02, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((E, I, H)) * 0.02, jnp.float32),
    }
    eq = mq4.quantize_experts_q4(experts)
    pe = {k: v[:NSH] for k, v in experts.items()}
    peq = mq4.quantize_experts_q4(pe)
    eq.update({f"pe_{k}": v for k, v in peq.items()})
    eq_leg = {
        k: (repack_legacy(v) if k.endswith("q4") else v) for k, v in eq.items()
    }
    for b in (1, 8):
        xm = jnp.asarray(rng.standard_normal((b, H)) * 0.5, jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, E, (b, K)), jnp.int32)
        wts = jnp.asarray(rng.random((b, K)), jnp.float32)

        def run_moe(x, ed):
            if b == 1:
                return mq4.moe_ffn_decode_q4(x, ed, wts, idx, with_shared=True)
            return mq4.moe_ffn_decode_q4_fused(x, ed, wts, idx)

        set_math(False)
        t = time_chain(chain(lambda x: run_moe(x, eq)), xm, iters_lo=64, iters_hi=512)
        print(f"moe b={b} OFFLO : {t*1e6:7.1f} us/layer", flush=True)
        set_math(True)
        try:
            t = time_chain(chain(lambda x: run_moe(x, eq_leg)), xm, iters_lo=64, iters_hi=512)
        finally:
            set_math(False)
        print(f"moe b={b} LEGACY: {t*1e6:7.1f} us/layer", flush=True)


if __name__ == "__main__":
    main()
