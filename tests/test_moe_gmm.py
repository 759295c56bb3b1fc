"""Pallas grouped-GEMM MoE prefill: exact vs the XLA grouped path.

Runs the kernels in interpret mode (CPU test platform); on TPU the same
code path is compiled. The visit schedule is also unit-tested directly
against a Python reference, including adversarial group layouts (empty
experts, groups crossing tile boundaries, single-expert takeover).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.ops.moe import moe_ffn_ragged, route
from deepseek_ocr2_tpu.ops.moe_gmm import _BM, _visit_schedule, moe_ffn_gmm


def _experts(e, h, i, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "gate": jnp.asarray(rng.standard_normal((e, h, i)).astype(np.float32) * 0.05),
        "up": jnp.asarray(rng.standard_normal((e, h, i)).astype(np.float32) * 0.05),
        "down": jnp.asarray(rng.standard_normal((e, i, h)).astype(np.float32) * 0.05),
    }


def _schedule_reference(sizes, m_pad, bm):
    """Brute-force visit list: (tile, expert, lo, hi) for every non-empty
    intersection, ordered by tile then expert."""
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    visits = []
    for t in range(m_pad // bm):
        t0, t1 = t * bm, t * bm + bm
        for e in range(len(sizes)):
            lo, hi = max(offsets[e], t0), min(offsets[e + 1], t1)
            if lo < hi:
                visits.append((t, e, lo, hi))
    return visits


@pytest.mark.parametrize(
    "sizes",
    [
        [5, 0, 700, 3, 0, 60],  # empty experts + one tile-crossing giant
        [0, 0, 0, 768],  # single-expert takeover
        [256, 256, 256],  # exact tile boundaries
        [1] * 64,  # all tiny
    ],
)
def test_visit_schedule_covers_all_rows(sizes):
    m = int(np.sum(sizes))
    m_pad = -(-max(m, 1) // _BM) * _BM
    vt, ve, lo, hi = jax.tree_util.tree_map(
        np.asarray, _visit_schedule(jnp.asarray(sizes, jnp.int32), m_pad, _BM)
    )
    got = [
        (int(t), int(e), int(l), int(h))
        for t, e, l, h in zip(vt, ve, lo, hi)
        if l < h
    ]
    assert got == _schedule_reference(sizes, m_pad, _BM)
    # Static visit bound honored.
    assert len(vt) == m_pad // _BM + len(sizes)
    # Out-block revisits must be consecutive (Pallas keeps the block in VMEM).
    assert list(vt) == sorted(vt)


@pytest.mark.parametrize("n,k,e,h,i", [(300, 6, 16, 128, 256), (64, 2, 8, 256, 128)])
def test_gmm_matches_ragged(n, k, e, h, i):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    experts = _experts(e, h, i)
    router = jnp.asarray(rng.standard_normal((h, e)).astype(np.float32) * 0.1)
    weights, idx = route(x, router, k)

    want = np.asarray(moe_ffn_ragged(x, experts, weights, idx), np.float32)
    got = np.asarray(
        moe_ffn_gmm(x, experts, weights, idx, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gmm_bf16_matches_ragged_to_ulp():
    """bf16 agreement with the XLA grouped path to ~1 bf16 ULP.

    ragged_dot's internal K-tiling rounds intermediates differently from a
    plain f32-accumulated dot, so cross-implementation bf16 outputs differ
    by at most one ULP (as they already do between the dense and ragged
    paths). The binding greedy-parity contract lives in the LM-level
    torch-oracle tests, which exercise the gmm path at prefill sizes."""
    rng = np.random.default_rng(5)
    n, k, e, h, i = 280, 4, 8, 128, 256
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32)).astype(jnp.bfloat16)
    experts = {kk: v.astype(jnp.bfloat16) for kk, v in _experts(e, h, i).items()}
    router = jnp.asarray(rng.standard_normal((h, e)).astype(np.float32) * 0.1)
    weights, idx = route(x.astype(jnp.float32), router, k)

    # DEFAULT matmul precision: the production bf16 path (the conftest's
    # global "highest" would lower bf16 ragged_dot to a multi-pass Mosaic
    # form the TPU backend rejects, and the kernel pins DEFAULT anyway).
    with jax.default_matmul_precision("default"):
        want = np.asarray(
            moe_ffn_ragged(x, experts, weights, idx).astype(jnp.float32), np.float32
        )
        got = np.asarray(
            moe_ffn_gmm(x, experts, weights, idx, interpret=True).astype(jnp.float32),
            np.float32,
        )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=8e-3)


def test_gmm_custom_vjp_matches_ragged_grads():
    """Training path: grads of the gmm wrapper must equal the XLA grouped
    path's grads (the custom VJP differentiates through moe_ffn_ragged)."""
    if jax.default_backend() != "tpu":
        pytest.skip("compiled Pallas forward requires a TPU backend")

    rng = np.random.default_rng(7)
    n, k, e, h, i = 64, 2, 4, 64, 32
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    experts = _experts(e, h, i, seed=7)
    router = jnp.asarray(rng.standard_normal((h, e)).astype(np.float32) * 0.1)
    weights, idx = route(x, router, k)

    def loss_gmm(x, ex, w):
        return jnp.sum(moe_ffn_gmm(x, ex, w, idx) ** 2)

    def loss_ragged(x, ex, w):
        return jnp.sum(moe_ffn_ragged(x, ex, w, idx) ** 2)

    g1 = jax.grad(loss_gmm, argnums=(0, 1, 2))(x, experts, weights)
    g2 = jax.grad(loss_ragged, argnums=(0, 1, 2))(x, experts, weights)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
        )


def test_gmm_backward_matches_ragged_vjp():
    """The visit-scheduled Pallas backward (dx / dW / dweights kernels) must
    match the VJP of the XLA grouped path to f32 roundoff."""
    e, h, i, k, n = 8, 64, 96, 2, 70
    experts = _experts(e, h, i, seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    router = jnp.asarray(rng.standard_normal((h, e)).astype(np.float32) * 0.1)
    w, idx = route(x, router, k)
    cot = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))

    @jax.jit
    def grads_gmm(x, ex, w):
        return jax.grad(
            lambda x, ex, w: jnp.sum(moe_ffn_gmm(x, ex, w, idx, interpret=True) * cot),
            argnums=(0, 1, 2),
        )(x, ex, w)

    @jax.jit
    def grads_ref(x, ex, w):
        return jax.grad(
            lambda x, ex, w: jnp.sum(moe_ffn_ragged(x, ex, w, idx) * cot),
            argnums=(0, 1, 2),
        )(x, ex, w)

    gg = grads_gmm(x, experts, w)
    gr = grads_ref(x, experts, w)
    for a, b in zip(jax.tree_util.tree_leaves(gg), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-6, rtol=3e-6
        )


def test_gmm_fused_ffn_bit_identical_to_split(monkeypatch):
    """DEEPSEEK_GMM_FUSED=1 (one swiglu+down kernel per layer) must be
    BIT-identical to the split pair: the fused kernel rounds the act tile
    to the compute dtype at exactly the point the split path rounded it
    for the HBM write."""
    rng = np.random.default_rng(9)
    n, k, e, h, i = 200, 4, 12, 128, 256
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    experts = _experts(e, h, i)
    router = jnp.asarray(rng.standard_normal((h, e)).astype(np.float32) * 0.1)
    weights, idx = route(x, router, k)

    monkeypatch.delenv("DEEPSEEK_GMM_FUSED", raising=False)
    want = np.asarray(moe_ffn_gmm(x, experts, weights, idx, interpret=True))
    monkeypatch.setenv("DEEPSEEK_GMM_FUSED", "1")
    got = np.asarray(moe_ffn_gmm(x, experts, weights, idx, interpret=True))
    np.testing.assert_array_equal(got, want)

    # bf16 compute dtype too (the serving prefill dtype).
    xb = x.astype(jnp.bfloat16)
    eb = {kk: v.astype(jnp.bfloat16) for kk, v in experts.items()}
    got_b = np.asarray(moe_ffn_gmm(xb, eb, weights, idx, interpret=True))
    monkeypatch.delenv("DEEPSEEK_GMM_FUSED")
    want_b = np.asarray(moe_ffn_gmm(xb, eb, weights, idx, interpret=True))
    np.testing.assert_array_equal(got_b, want_b)
