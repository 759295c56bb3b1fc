"""bf16 MoE decode dispatch at serving batch (VERDICT r5 #2).

At b=8, n*k=48 <= E=64 routes moe_ffn_decode to the UNROLLED per-selection
path: 48 expert weight reads/layer where the distinct-visit kernel reads
each distinct selected expert once (~34 expected for 48 draws of 64) and
batches rows. A/B both at b=4/8/16 bf16, plus correctness, to set the
dispatch threshold from measurement.

Also spot-validates the stacked-h-dot q4 kernels (B%8) on hardware.
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

from deepseek_ocr2_tpu.ops.moe import moe_ffn_decode
from deepseek_ocr2_tpu.ops.moe_decode import moe_ffn_decode_fused
import deepseek_ocr2_tpu.ops.linear_q4 as lq4
import deepseek_ocr2_tpu.ops.moe_q4 as mq4
import deepseek_ocr2_tpu.ops.attn_fused as af

H, I, E, K = 1280, 896, 64, 6
HEADS, D = 10, 128


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # canary
    w = jnp.asarray(rng.standard_normal((H, 129280)) * 0.02, jnp.float32)
    q4h = lq4.quantize_linear_q4(w)
    xc = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.bfloat16)
    t = time_chain(chain(lambda x: lq4.linear_q4(x, q4h)), xc)
    print(f"canary lm_head b=1: {t*1e6:7.1f} us (clean if <125)", flush=True)
    del w, q4h

    experts = {
        "gate": jnp.asarray(rng.standard_normal((E, H, I)) * 0.02, jnp.bfloat16),
        "up": jnp.asarray(rng.standard_normal((E, H, I)) * 0.02, jnp.bfloat16),
        "down": jnp.asarray(rng.standard_normal((E, I, H)) * 0.02, jnp.bfloat16),
    }
    bytes_per_expert = sum(v.size * v.dtype.itemsize for v in experts.values()) / E

    for b in (4, 8, 16):
        xm = jnp.asarray(rng.standard_normal((b, H)) * 0.5, jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, E, (b, K)), jnp.int32)
        wts = jnp.asarray(rng.random((b, K)), jnp.float32)
        n_distinct = len(np.unique(np.asarray(idx)))

        a = np.asarray(moe_ffn_decode(xm, experts, wts, idx), np.float32)
        f = np.asarray(moe_ffn_decode_fused(xm, experts, wts, idx), np.float32)
        err = np.abs(a - f).max() / (np.abs(a).max() + 1e-9)

        # idx must DEPEND on the scan carry: with a constant idx XLA hoists
        # the expert dynamic_slices out of the timing loop entirely (a run
        # read an impossible 2.8 TB/s). The real decode loop's idx comes
        # from the router each step — data-dependent by construction.
        def dyn_idx(x):
            z = (jnp.ravel(x)[:1] * 0).astype(jnp.int32)[0]
            return idx + z

        t_u = time_chain(
            chain(lambda x, g, u, d: moe_ffn_decode(x, {"gate": g, "up": u, "down": d}, wts, dyn_idx(x))),
            xm, experts["gate"], experts["up"], experts["down"],
            iters_lo=32, iters_hi=160,
        )
        t_f = time_chain(
            chain(lambda x, g, u, d: moe_ffn_decode_fused(x, {"gate": g, "up": u, "down": d}, wts, dyn_idx(x))),
            xm, experts["gate"], experts["up"], experts["down"],
            iters_lo=32, iters_hi=160,
        )
        gb_u = bytes_per_expert * b * K / t_u / 1e9
        gb_f = bytes_per_expert * n_distinct / t_f / 1e9
        print(
            f"b={b:2d} (sel {b*K}, distinct {n_distinct})  "
            f"unrolled {t_u*1e6:7.1f} us ({gb_u:5.0f} GB/s of {b*K} reads)  "
            f"fused {t_f*1e6:7.1f} us ({gb_f:5.0f} GB/s of {n_distinct} reads)  "
            f"rel_err {err:.1e}",
            flush=True,
        )

    # stacked-h-dot q4 validation on hardware (b=8 => B%8 path)
    experts_f32 = {k: v.astype(jnp.float32) for k, v in experts.items()}
    eq = mq4.quantize_experts_q4(experts_f32)
    xm = jnp.asarray(rng.standard_normal((8, H)) * 0.5, jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, E, (8, K)), jnp.int32)
    wts = jnp.asarray(rng.random((8, K)), jnp.float32)
    want = np.asarray(mq4.moe_ffn_decode_q4_xla(xm, eq, wts, idx), np.float32)
    got = np.asarray(mq4.moe_ffn_decode_q4_fused(xm, eq, wts, idx), np.float32)
    err = np.abs(want - got).max() / (np.abs(want).max() + 1e-9)
    print(f"q4 fused b=8 stacked-h-dot vs XLA: rel_err {err:.2e}", flush=True)
    eq_keys = sorted(eq)
    t = time_chain(
        chain(lambda x, *vs: mq4.moe_ffn_decode_q4_fused(x, dict(zip(eq_keys, vs)), wts, idx)),
        xm, *[eq[k] for k in eq_keys], iters_lo=64, iters_hi=512)
    print(f"q4 moe fused b=8 (stacked): {t*1e6:7.1f} us/layer", flush=True)


if __name__ == "__main__":
    main()
