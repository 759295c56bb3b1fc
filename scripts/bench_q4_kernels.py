"""int4 vs int8 decode-kernel rooflines on the real LM shapes (idle TPU).

Run manually on hardware (one TPU process at a time). The w4a16 kernels
(ops/linear_q4, ops/moe_q4) halve the int8 weight DMA but pay an in-kernel
i32 nibble unpack on the VPU — whether that trades well per shape is a
hardware question. Decode shapes (full config): lm_head [1280, 129280],
wqkv [1280, 3840], wo [1280, 1280], dense gu [1280, 13696], dense down
[6848, 1280], expert gu [1280, 1792] / down [896, 1280] x6 routed + 2
shared pe visits.

All timings use the difference method (two lax.scan lengths; the ~30 ms
dispatch floor otherwise swamps sub-ms kernels).
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

from deepseek_ocr2_tpu.ops.linear_q4 import linear_q4, linear_q4_xla, quantize_linear_q4
from deepseek_ocr2_tpu.ops.linear_q8 import linear_q8, quantize_linear
from deepseek_ocr2_tpu.ops.moe_q4 import moe_ffn_decode_q4, quantize_experts_q4
from deepseek_ocr2_tpu.ops.moe_q8 import moe_ffn_decode_q8, quantize_experts


def q4_bytes(q):
    return q["q4"].size + 4 * q["scale"].size


def q8_bytes(q):
    return q["q8"].size + 4 * q["scale"].size


def bench_linear(name, in_dim, out_dim, b):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((in_dim, out_dim)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, in_dim)) * 0.5, jnp.bfloat16)
    q4 = quantize_linear_q4(w)
    q8 = quantize_linear(w)

    # correctness spot-check on device
    want = np.asarray(linear_q4_xla(x, q4, out_dtype=jnp.float32))
    got = np.asarray(linear_q4(x, q4, out_dtype=jnp.float32))
    err = np.abs(want - got).max() / (np.abs(want).max() + 1e-9)
    assert err < 5e-2, (name, err)

    t4 = time_chain(chain(lambda x: linear_q4(x, q4)), x)
    t8 = time_chain(chain(lambda x: linear_q8(x, q8)), x)
    print(
        f"{name:28s} b={b:<3d} q4 {t4 * 1e6:8.1f} us ({q4_bytes(q4) / t4 / 1e9:6.1f} GB/s)"
        f" | q8 {t8 * 1e6:8.1f} us ({q8_bytes(q8) / t8 / 1e9:6.1f} GB/s)"
        f" | speedup {t8 / t4:5.2f}x"
    )
    return t4, t8


def bench_moe(b, k=6, e=64, h=1280, i=896, n_sh=2):
    rng = np.random.default_rng(1)

    def mk(e_, scale=0.02):
        return {
            "gate": jnp.asarray(rng.standard_normal((e_, h, i)) * scale, jnp.float32),
            "up": jnp.asarray(rng.standard_normal((e_, h, i)) * scale, jnp.float32),
            "down": jnp.asarray(rng.standard_normal((e_, i, h)) * scale, jnp.float32),
        }

    experts, shared = mk(e), mk(n_sh)
    q4 = quantize_experts_q4(experts)
    q4.update({f"pe_{kk}": v for kk, v in quantize_experts_q4(shared).items()})
    q8 = quantize_experts(experts)
    q8.update({f"pe_{kk}": v for kk, v in quantize_experts(shared).items()})

    idx = jnp.asarray(
        np.stack([rng.choice(e, size=k, replace=False) for _ in range(b)]), jnp.int32
    )
    wts = jnp.asarray(rng.random((b, k)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)

    with_shared = b == 1
    f4 = chain(lambda x: moe_ffn_decode_q4(x, q4, wts, idx, with_shared=with_shared))
    f8 = chain(lambda x: moe_ffn_decode_q8(x, q8, wts, idx, with_shared=with_shared))
    t4 = time_chain(f4, x)
    t8 = time_chain(f8, x)
    by4 = sum(v.size * (1 if v.dtype == jnp.int8 else 4) for v in q4.values())
    by8 = sum(v.size * (1 if v.dtype == jnp.int8 else 4) for v in q8.values())
    visits4 = b * k + (n_sh if with_shared else 0)
    frac = visits4 / (e + n_sh)
    print(
        f"moe per-selection            b={b:<3d} q4 {t4 * 1e6:8.1f} us"
        f" (~{by4 * frac / t4 / 1e9:6.1f} GB/s sel)"
        f" | q8 {t8 * 1e6:8.1f} us (~{by8 * frac / t8 / 1e9:6.1f} GB/s)"
        f" | speedup {t8 / t4:5.2f}x"
    )


def main():
    print(f"device: {jax.devices()[0]}")
    for b in (1, 8):
        bench_linear("lm_head [1280,129280]", 1280, 129280, b)
        bench_linear("wqkv [1280,3840]", 1280, 3840, b)
        bench_linear("wo [1280,1280]", 1280, 1280, b)
        bench_linear("dense gu [1280,13696]", 1280, 13696, b)
        bench_linear("dense down [6848,1280]", 6848, 1280, b)
        bench_linear("expert gu [1280,1792]", 1280, 1792, b)
        bench_linear("expert down [896,1280]", 896, 1280, b)
        bench_moe(b)


if __name__ == "__main__":
    main()
