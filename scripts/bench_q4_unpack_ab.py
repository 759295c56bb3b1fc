"""Same-session A/B: 4-shift vs 3-shift int4 nibble unpack (idle TPU).

The int4 decode MoE is VPU-bound on the in-kernel unpack (docs/DESIGN.md
round-3 ledger: 390 us for 11 MoE layers vs ~205 us byte floor at b=1);
`unpack_q4` is the choke point for every q4 kernel. The 3-shift form
recovers the high nibble with a single arithmetic shift (the i8->i32
widen already sign-extended the byte). This script swaps the two
implementations inside one process so the comparison is contention- and
session-noise-free (difference-method timings as always).
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

from deepseek_ocr2_tpu.ops import linear_q4 as lq4
from deepseek_ocr2_tpu.ops.linear_q4 import linear_q4, quantize_linear_q4
from deepseek_ocr2_tpu.ops.moe_q4 import moe_ffn_decode_q4, quantize_experts_q4


def unpack_4shift(packed_i32):
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(packed_i32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(packed_i32, 24), 28)
    return lo, hi


def unpack_3shift(packed_i32):
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(packed_i32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(packed_i32, 4)
    return lo, hi


def bench_all(tag):
    rng = np.random.default_rng(1)
    h, i, e, k, n_sh = 1280, 896, 64, 6, 2

    def mk(e_, scale=0.02):
        return {
            "gate": jnp.asarray(rng.standard_normal((e_, h, i)) * scale, jnp.float32),
            "up": jnp.asarray(rng.standard_normal((e_, h, i)) * scale, jnp.float32),
            "down": jnp.asarray(rng.standard_normal((e_, i, h)) * scale, jnp.float32),
        }

    q4 = quantize_experts_q4(mk(e))
    q4.update({f"pe_{kk}": v for kk, v in quantize_experts_q4(mk(n_sh)).items()})
    w_lm = jnp.asarray(rng.standard_normal((1280, 129280)) * 0.02, jnp.float32)
    q_lm = quantize_linear_q4(w_lm)
    out = {}
    for b in (1, 8):
        idx = jnp.asarray(
            np.stack([rng.choice(e, size=k, replace=False) for _ in range(b)]),
            jnp.int32,
        )
        wts = jnp.asarray(rng.random((b, k)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)
        with_shared = b == 1
        t_moe = time_chain(
            chain(lambda x: moe_ffn_decode_q4(x, q4, wts, idx, with_shared=with_shared)),
            x,
        )
        t_lm = time_chain(chain(lambda x: linear_q4(x, q_lm)), x)
        out[(b, "moe")] = t_moe
        out[(b, "lm")] = t_lm
        print(f"{tag:8s} b={b}  moe {t_moe * 1e6:8.1f} us   lm_head {t_lm * 1e6:8.1f} us")
    return out


def check_correct():
    """Kernel vs host-numpy dequant (no device lowering in the oracle).

    Covers BOTH linear kernels: (1280, 512) takes the wide column-blocked
    path, (1792, 128) the K-blocked tall-weight path (In >= 2*Out). The
    MoE / fused-attn unpack paths are numerically pinned by the repo suite
    (tests/test_moe_q4.py, test_attn_fused.py)."""
    rng = np.random.default_rng(3)
    for k, n in [(1280, 512), (1792, 128)]:
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        x = jnp.asarray(rng.standard_normal((2, k)) * 0.5, jnp.bfloat16)
        q = quantize_linear_q4(jnp.asarray(w))
        packed = np.asarray(q["q4"]).astype(np.int32)
        lo = (packed << 28) >> 28
        hi = (packed << 24) >> 28
        vals = np.stack([lo.reshape(-1, 128, n), hi.reshape(-1, 128, n)], 1)
        vals = vals.reshape(k // 128, 128, n)
        wd = (vals * np.asarray(q["scale"])[:, None, :]).reshape(k, n)
        want = np.asarray(x, np.float32) @ wd
        got = np.asarray(linear_q4(x, q, out_dtype=jnp.float32))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert err < 2e-2, err
        print(f"correctness vs host-numpy dequant ({k}x{n}): rel err {err:.2e} OK")


def main():
    print(f"device: {jax.devices()[0]}")
    check_correct()
    lq4.unpack_q4 = unpack_4shift
    base = bench_all("4-shift")
    lq4.unpack_q4 = unpack_3shift
    new = bench_all("3-shift")
    for key in base:
        print(f"{key}: {base[key] / new[key]:5.3f}x")


if __name__ == "__main__":
    main()
