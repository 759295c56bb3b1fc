"""Manual double-buffered DMA variants for the int4 b=1 kernels.

E1: wqkv wide dot — weights in ANY (HBM); kernel DMAs [128, Out] packed
    slabs into a 2-slot VMEM scratch (unrolled static loop), overlapping
    slab j's unpack+dot with slab j+1's DMA. Compare vs the shipping
    auto-pipelined kernel (which at b=1 is ONE grid step: zero overlap).
E2: MoE visit loop — experts in ANY; visit v+1's gu+down blocks DMA while
    visit v computes. Expert index via scalar prefetch.
Both also in offset-lo packing variants (4 VPU ops/byte).
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
    unpack_q4,
)
from deepseek_ocr2_tpu.ops.moe_q4 import moe_ffn_decode_q4, quantize_experts_q4

H, I, E, K, NSH = 1280, 896, 64, 6, 2


# ------------------------------------------------------------------ E1
def _manual_kernel(x_ref, s_ref, w_hbm, o_ref, wbuf, sem, *, offlo: bool):
    kp2 = w_hbm.shape[0]
    n = kp2 // _SUB
    x = x_ref[:]

    def dma(j):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(j * _SUB, _SUB), :], wbuf.at[j % 2], sem.at[j % 2]
        )

    dma(0).start()
    acc = None
    for j in range(n):
        if j + 1 < n:
            dma(j + 1).start()
        dma(j).wait()
        w = wbuf[j % 2]
        o = 2 * j * _SUB
        x_lo = x[:, o : o + _SUB]
        x_hi = x[:, o + _SUB : o + 2 * _SUB]
        if offlo:
            v_c = w.astype(x.dtype)
            h_c = jax.lax.shift_right_arithmetic(w.astype(jnp.int32), 4).astype(x.dtype)
            d_v = _dot_default(x_lo, v_c)
            d_hlo = _dot_default(x_lo, h_c)
            d_hhi = _dot_default(x_hi, h_c)
            rs = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
            t = (d_v - 16.0 * d_hlo - 8.0 * rs) * s_ref[2 * j : 2 * j + 1, :]
            t = t + d_hhi * s_ref[2 * j + 1 : 2 * j + 2, :]
        else:
            lo, hi = unpack_q4(w.astype(jnp.int32))
            t = _dot_default(x_lo, lo.astype(x.dtype)) * s_ref[2 * j : 2 * j + 1, :]
            t = t + _dot_default(x_hi, hi.astype(x.dtype)) * s_ref[2 * j + 1 : 2 * j + 2, :]
        acc = t if acc is None else acc + t
    o_ref[:] = acc


def linear_q4_manual(x, q4p, scale, *, offlo=False):
    kp2, out_dim = q4p.shape
    kp = 2 * kp2
    b = x.shape[0]
    return pl.pallas_call(
        functools.partial(_manual_kernel, offlo=offlo),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // _GRP, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((b, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _SUB, out_dim), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x, scale, q4p)


# ------------------------------------------------------------------ E2
def _moe_manual_kernel(
    idx_ref,  # [V] i32 scalar prefetch (expert per visit)
    x_ref,  # [1, Hp]
    wv_ref,  # [V, 1] f32 combine weights (VMEM)
    gu_hbm,  # [E, hp2, 2I] ANY
    gus_hbm,  # [E, gg, 2I] ANY
    d_hbm,  # [E, ip2, H] ANY
    ds_hbm,  # [E, dg, H] ANY
    o_ref,  # [1, H]
    gubuf,  # [2, hp2, 2I] i8
    gusbuf,  # [2, gg, 2I] f32
    dbuf,  # [2, ip2, H] i8
    dsbuf,  # [2, dg, H] f32
    sems,  # DMA (2, 4)
    *,
    n_visits: int,
    offlo: bool,
):
    x = x_ref[:]
    hp2 = gu_hbm.shape[1]
    ip2 = d_hbm.shape[1]

    def dmas(v):
        e = idx_ref[v]
        s = v % 2
        return [
            pltpu.make_async_copy(gu_hbm.at[e], gubuf.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(gus_hbm.at[e], gusbuf.at[s], sems.at[s, 1]),
            pltpu.make_async_copy(d_hbm.at[e], dbuf.at[s], sems.at[s, 2]),
            pltpu.make_async_copy(ds_hbm.at[e], dsbuf.at[s], sems.at[s, 3]),
        ]

    for d in dmas(0):
        d.start()

    def slab_dot(xx, wref, sref, n, base_s):
        acc = None
        for j in range(n):
            w = wref[j * _SUB : (j + 1) * _SUB, :]
            o = 2 * j * _SUB
            x_lo = xx[:, o : o + _SUB]
            x_hi = xx[:, o + _SUB : o + 2 * _SUB]
            if offlo:
                v_c = w.astype(xx.dtype)
                h_c = jax.lax.shift_right_arithmetic(w.astype(jnp.int32), 4).astype(xx.dtype)
                d_v = _dot_default(x_lo, v_c)
                d_hlo = _dot_default(x_lo, h_c)
                d_hhi = _dot_default(x_hi, h_c)
                rs = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
                t = (d_v - 16.0 * d_hlo - 8.0 * rs) * sref[2 * j : 2 * j + 1, :]
                t = t + d_hhi * sref[2 * j + 1 : 2 * j + 2, :]
            else:
                lo, hi = unpack_q4(w.astype(jnp.int32))
                t = _dot_default(x_lo, lo.astype(xx.dtype)) * sref[2 * j : 2 * j + 1, :]
                t = t + _dot_default(x_hi, hi.astype(xx.dtype)) * sref[2 * j + 1 : 2 * j + 2, :]
            acc = t if acc is None else acc + t
        return acc

    out = None
    for v in range(n_visits):
        if v + 1 < n_visits:
            for d in dmas(v + 1):
                d.start()
        for d in dmas(v):
            d.wait()
        s = v % 2
        h2 = slab_dot(x, gubuf[s], gusbuf[s], hp2 // _SUB, 0)  # [1, 2I]
        i = h2.shape[-1] // 2
        gate, up = h2[:, :i], h2[:, i:]
        act = (jax.nn.silu(gate) * up).astype(x.dtype)
        ip = 2 * ip2
        if ip != i:
            act = jnp.concatenate([act, jnp.zeros((act.shape[0], ip - i), act.dtype)], axis=1)
        y = slab_dot(act, dbuf[s], dsbuf[s], ip2 // _SUB, 0)  # [1, H]
        y = y * wv_ref[v : v + 1, :]
        out = y if out is None else out + y
    o_ref[:] = out


def moe_q4_manual(x, eq, wts, idx, *, offlo=False):
    """b=1, visits = idx.shape[1] (pe already appended into eq)."""
    b, h = x.shape
    assert b == 1
    e, hp2, i2 = eq["gu_q4"].shape
    ip2 = eq["down_q4"].shape[1]
    v = idx.shape[1]
    # Pad scale sublane dims to multiples of 8 (DMA slice tiling rule).
    def _pad8(s):
        g = s.shape[1]
        gp = -(-g // 8) * 8
        return s if gp == g else jnp.pad(s, ((0, 0), (0, gp - g), (0, 0)))

    gus = _pad8(eq["gu_scale"])
    dss = _pad8(eq["down_scale"])
    gg = gus.shape[1]
    dg = dss.shape[1]
    xp = jnp.pad(x, ((0, 0), (0, 2 * hp2 - h))) if 2 * hp2 != h else x
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, 2 * hp2), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 1), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((b, h), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, hp2, i2), jnp.int8),
            pltpu.VMEM((2, gg, i2), jnp.float32),
            pltpu.VMEM((2, ip2, h), jnp.int8),
            pltpu.VMEM((2, dg, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_moe_manual_kernel, n_visits=v, offlo=offlo),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
    )(
        idx.reshape(-1).astype(jnp.int32),
        xp,
        wts.reshape(v, 1).astype(jnp.float32),
        eq["gu_q4"],
        gus,
        eq["down_q4"],
        dss,
    )
    return out.astype(x.dtype)


def repack_offlo(q4packed):
    """Shipping packed bytes -> offset-lo packed bytes (lo' = lo + 8)."""
    v = q4packed.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(v, 28), 28)
    hi = jax.lax.shift_right_arithmetic(v, 4)
    out = ((lo + 8) & 0xF) | ((hi & 0xF) << 4)
    return jax.lax.bitcast_convert_type(out.astype(jnp.uint8), jnp.int8)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # canary
    w = jnp.asarray(rng.standard_normal((H, 129280)) * 0.02, jnp.float32)
    q4h = quantize_linear_q4(w)
    xc = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    t = time_chain(chain(lambda x: linear_q4(x, q4h)), xc)
    print(f"canary lm_head b=1: {t*1e6:7.1f} us ({'CLEAN' if t*1e6 < 125 else 'DIRTY'})", flush=True)
    del w, q4h

    # ---- E1 wqkv [1280, 3840]
    wq = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.02, jnp.float32)
    q4w = quantize_linear_q4(wq)
    q4w_off = repack_offlo(q4w["q4"])
    x = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    nb = q4w["q4"].size + 4 * q4w["scale"].size

    from deepseek_ocr2_tpu.ops.linear_q4 import linear_q4 as lq4

    want = np.asarray(lq4(x, q4w, out_dtype=jnp.float32))
    got_m = np.asarray(linear_q4_manual(x, q4w["q4"], q4w["scale"]))
    got_mo = np.asarray(linear_q4_manual(x, q4w_off, q4w["scale"], offlo=True))
    print(
        f"E1 numerics: manual {np.abs(want-got_m).max()/np.abs(want).max():.2e}  "
        f"manual+offlo {np.abs(want-got_mo).max()/np.abs(want).max():.2e}",
        flush=True,
    )
    for name, fn in [
        ("shipping auto", lambda x: lq4(x, q4w)),
        ("manual dbuf", lambda x: linear_q4_manual(x, q4w["q4"], q4w["scale"])),
        ("manual dbuf+offlo", lambda x: linear_q4_manual(x, q4w_off, q4w["scale"], offlo=True)),
    ]:
        t = time_chain(chain(fn), x, iters_lo=64, iters_hi=512)
        print(f"E1 wqkv b=1 {name:18s}: {t*1e6:7.1f} us  {nb/t/1e9:6.1f} GB/s", flush=True)

    # ---- E2 MoE visits (pe appended, V=8)
    experts = {
        "gate": jnp.asarray(rng.standard_normal((E + NSH, H, I)) * 0.02, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((E + NSH, H, I)) * 0.02, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((E + NSH, I, H)) * 0.02, jnp.float32),
    }
    eq = quantize_experts_q4(experts)
    eq_off = dict(eq)
    eq_off["gu_q4"] = repack_offlo(eq["gu_q4"])
    eq_off["down_q4"] = repack_offlo(eq["down_q4"])
    xm = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    idx = jnp.concatenate(
        [jnp.asarray(rng.integers(0, E, (1, K)), jnp.int32), jnp.asarray([[E, E + 1]], jnp.int32)], 1
    )
    wts = jnp.concatenate(
        [jnp.asarray(rng.random((1, K)), jnp.float32), jnp.ones((1, NSH), jnp.float32)], 1
    )
    per_visit = (eq["gu_q4"].size + eq["down_q4"].size + 4 * (eq["gu_scale"].size + eq["down_scale"].size)) / (E + NSH)
    nb8 = per_visit * (K + NSH)

    want = np.asarray(moe_ffn_decode_q4(xm, eq, wts, idx), np.float32)
    got = np.asarray(moe_q4_manual(xm, eq, wts, idx), np.float32)
    got_o = np.asarray(moe_q4_manual(xm, eq_off, wts, idx, offlo=True), np.float32)
    print(
        f"E2 numerics: manual {np.abs(want-got).max()/np.abs(want).max():.2e}  "
        f"manual+offlo {np.abs(want-got_o).max()/np.abs(want).max():.2e}",
        flush=True,
    )
    for name, fn in [
        ("shipping auto", lambda x: moe_ffn_decode_q4(x, eq, wts, idx)),
        ("manual dbuf", lambda x: moe_q4_manual(x, eq, wts, idx)),
        ("manual dbuf+offlo", lambda x: moe_q4_manual(x, eq_off, wts, idx, offlo=True)),
    ]:
        t = time_chain(chain(fn), xm, iters_lo=64, iters_hi=512)
        print(f"E2 moe  b=1 {name:18s}: {t*1e6:7.1f} us  {nb8/t/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
