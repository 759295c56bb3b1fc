"""What bounds the int4 b=1 decode kernels: DMA, unpack (VPU), or dots?

Same-session A/B (one process, contention-free): swap the innards of the
shared q4 slab machinery and time each kernel (diff-method):

  real    — shipping 3-shift unpack + 2 dots/slab
  noshift — skip the nibble shifts (wrong numerics, same converts + dots):
            isolates the shift share of the VPU wall
  noconv  — raw i32 slabs summed (1 row/slab) only: weights still DMA'd,
            ~zero compute: isolates the DMA floor (if Pallas elides the
            unused block DMA this reads ~0 — check against the byte time)

Kernels probed at b=1 (latency path): fused decode attention per layer
(wqkv+RoPE+flash+wo), per-selection MoE (6 routed + 2 shared visits),
q4 lm_head. Interpretation: real - noshift = shift cost; noshift -
noconv = converts + dots; noconv = DMA + launch floor.

Run manually on an idle TPU.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import chain, time_chain  # noqa: E402

from deepseek_ocr2_tpu.configs import DeepseekV2Config
from deepseek_ocr2_tpu.ops import attn_fused as af
from deepseek_ocr2_tpu.ops import linear_q4 as lq4
from deepseek_ocr2_tpu.ops import moe_q4 as mq4
from deepseek_ocr2_tpu.ops.linear_q4 import quantize_linear_q4
from deepseek_ocr2_tpu.ops.moe_q4 import quantize_experts_q4

B = 1
CAP = 512
POS = 300

real_slabs = lq4.q4_dot_slabs


def noshift_slabs(x, w_slabs, s_slabs, n_slabs, dot):
    acc = None
    for j in range(n_slabs):
        w = w_slabs(j).astype(jnp.int32)  # widen, no shifts
        o = 2 * j * 128
        t = dot(x[:, o : o + 128], w.astype(x.dtype)) * s_slabs(2 * j)
        t = t + dot(x[:, o + 128 : o + 256], w.astype(x.dtype)) * s_slabs(2 * j + 1)
        acc = t if acc is None else acc + t
    return acc


def noconv_slabs(x, w_slabs, s_slabs, n_slabs, dot):
    b = x.shape[0]
    acc = None
    for j in range(n_slabs):
        row = w_slabs(j)[:1, :].astype(jnp.float32) * jnp.float32(0)
        t = jnp.broadcast_to(row, (b, row.shape[1]))
        acc = t if acc is None else acc + t
    return acc


def set_variant(fn):
    lq4.q4_dot_slabs = fn
    mq4.q4_dot_slabs = fn
    af.q4_dot_slabs = fn


def bench_moe(tag):
    rng = np.random.default_rng(1)
    h, i, e, k, n_sh = 1280, 896, 64, 6, 2

    def mk(e_):
        return {
            "gate": jnp.asarray(rng.standard_normal((e_, h, i)) * 0.02, jnp.float32),
            "up": jnp.asarray(rng.standard_normal((e_, h, i)) * 0.02, jnp.float32),
            "down": jnp.asarray(rng.standard_normal((e_, i, h)) * 0.02, jnp.float32),
        }

    q4 = quantize_experts_q4(mk(e))
    q4.update({f"pe_{kk}": v for kk, v in quantize_experts_q4(mk(n_sh)).items()})
    idx = jnp.asarray(rng.choice(e, size=(B, k), replace=False), jnp.int32)
    wts = jnp.asarray(rng.random((B, k)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, h)) * 0.5, jnp.bfloat16)
    t = time_chain(
        chain(lambda x: mq4.moe_ffn_decode_q4(x, q4, wts, idx, with_shared=True)), x,
        iters_lo=64, iters_hi=512, reps=7,
    )
    print(f"moe    b=1 {tag:8s}: {t * 1e6:8.1f} us", flush=True)


def bench_lm(tag):
    rng = np.random.default_rng(2)
    q_lm = quantize_linear_q4(
        jnp.asarray(rng.standard_normal((1280, 129280)) * 0.02, jnp.float32)
    )
    x = jnp.asarray(rng.standard_normal((B, 1280)) * 0.5, jnp.bfloat16)
    t = time_chain(chain(lambda x: lq4.linear_q4(x, q_lm)), x, iters_lo=64, iters_hi=512, reps=7)
    print(f"lmhead b=1 {tag:8s}: {t * 1e6:8.1f} us", flush=True)


def bench_attn(tag):
    cfg = DeepseekV2Config()
    rng = np.random.default_rng(3)
    h, nh, d, L = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim, 12
    wqkv = quantize_linear_q4(
        jnp.asarray(rng.standard_normal((h, 3 * h)) * 0.02, jnp.float32)
    )
    wo = quantize_linear_q4(
        jnp.asarray(rng.standard_normal((h, h)) * 0.02, jnp.float32)
    )
    wqkv = {"q4": wqkv["q4"], "scale": wqkv["scale"]}
    wo = {"q4": wo["q4"], "scale": wo["scale"]}
    k_all = jnp.asarray(
        rng.standard_normal((L, B, nh, CAP, d)) * 0.1, jnp.bfloat16
    )
    v_all = jnp.asarray(np.asarray(k_all))
    pos_b = jnp.full((B,), POS, jnp.int32)
    cos_b = jnp.ones((B, d), jnp.float32)
    sin_b = jnp.zeros((B, d), jnp.float32)
    xn = jnp.asarray(rng.standard_normal((B, h)) * 0.5, jnp.bfloat16)

    def one(xn):
        out, kn, vn = af.attn_decode_fused_raw(
            xn, wqkv, wo, k_all, v_all, 0, pos_b, cos_b, sin_b,
            n_heads=nh, head_dim=d,
        )
        # Fold the K/V outputs in so they aren't dead code; keep [B, H] shape.
        return out + (jnp.sum(kn) + jnp.sum(vn)).astype(out.dtype) * out.dtype.type(1e-9)

    t = time_chain(chain(one), xn, iters_lo=64, iters_hi=512, reps=7)
    print(f"attn   b=1 {tag:8s}: {t * 1e6:8.1f} us/layer", flush=True)


def probe_concurrent_transfers():
    """Does the tunnel multiplex? 4x12.4 MB shipped serially vs from 4
    threads — if concurrent streams scale, the serve prefetcher should
    ship from a small thread pool instead of one worker."""
    import threading
    import time

    rng = np.random.default_rng(0)
    arrs = [rng.integers(0, 256, (2304, 1792, 3), np.uint8) for _ in range(4)]
    devs = [jax.device_put(a) for a in arrs]
    for d in devs:
        np.asarray(d[0, 0, :1])
    t0 = time.perf_counter()
    devs = [jax.device_put(a) for a in arrs]
    for d in devs:
        np.asarray(d[0, 0, :1])
    t_serial = time.perf_counter() - t0

    out = [None] * 4

    def ship(i):
        d = jax.device_put(arrs[i])
        np.asarray(d[0, 0, :1])
        out[i] = d

    t0 = time.perf_counter()
    ts = [threading.Thread(target=ship, args=(i,)) for i in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    t_conc = time.perf_counter() - t0
    print(
        f"transfer 4x12.4MB: serial {t_serial * 1e3:.0f} ms, "
        f"4-thread {t_conc * 1e3:.0f} ms ({t_serial / t_conc:.2f}x)",
        flush=True,
    )


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    probe_concurrent_transfers()
    for tag, fn in (("real", real_slabs), ("noshift", noshift_slabs), ("noconv", noconv_slabs)):
        set_variant(fn)
        bench_attn(tag)
        bench_moe(tag)
        bench_lm(tag)


if __name__ == "__main__":
    main()
