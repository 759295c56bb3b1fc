"""Fused ViT MLP kernel vs the XLA form (ops/fused_mlp.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.ops.fused_mlp import mlp_gelu


def _xla_ref(x, w1, b1, w2, b2):
    import jax

    h = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
    g = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return g @ w2.astype(x.dtype) + b2.astype(x.dtype)


@pytest.mark.parametrize("m,block_m", [(384, 256), (512, 512), (100, 512)])
def test_fused_mlp_matches_xla_f32(m, block_m):
    rng = np.random.default_rng(0)
    e, f = 128, 256
    x = jnp.asarray(rng.standard_normal((m, e)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((f,)).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.standard_normal((f, e)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((e,)).astype(np.float32) * 0.02)
    ref = np.asarray(_xla_ref(x, w1, b1, w2, b2))
    got = np.asarray(mlp_gelu(x, w1, b1, w2, b2, block_m=block_m, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_fused_mlp_f_split_matches_unsplit():
    rng = np.random.default_rng(2)
    m, e, f = 300, 128, 256
    x = jnp.asarray(rng.standard_normal((m, e)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((f,)).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.standard_normal((f, e)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((e,)).astype(np.float32) * 0.02)
    base = np.asarray(mlp_gelu(x, w1, b1, w2, b2, block_m=256, interpret=True))
    for n_split in (2, 4):
        got = np.asarray(
            mlp_gelu(x, w1, b1, w2, b2, block_m=256, interpret=True, n_split=n_split)
        )
        # Only the f32 association of the partial down-products differs.
        np.testing.assert_allclose(got, base, atol=1e-6, rtol=1e-6)


def test_fused_mlp_matches_xla_bf16():
    rng = np.random.default_rng(1)
    m, e, f = 300, 128, 256
    x = jnp.asarray(rng.standard_normal((m, e)).astype(np.float32) * 0.1).astype(
        jnp.bfloat16
    )
    w1 = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32) * 0.05).astype(
        jnp.bfloat16
    )
    b1 = jnp.asarray(rng.standard_normal((f,)).astype(np.float32) * 0.02).astype(
        jnp.bfloat16
    )
    w2 = jnp.asarray(rng.standard_normal((f, e)).astype(np.float32) * 0.05).astype(
        jnp.bfloat16
    )
    b2 = jnp.asarray(rng.standard_normal((e,)).astype(np.float32) * 0.02).astype(
        jnp.bfloat16
    )
    ref = np.asarray(_xla_ref(x, w1, b1, w2, b2), np.float32)
    got = np.asarray(
        mlp_gelu(x, w1, b1, w2, b2, block_m=256, interpret=True), np.float32
    )
    # The kernel writes the same rounding points, but the compiler folds the
    # bf16->f32 convert chain between the bias add and the gelu (verified by
    # stage-wise bisection: each stage alone is bit-exact), skipping one
    # intermediate rounding — differences are within 1 bf16 ulp.
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=0.05)
