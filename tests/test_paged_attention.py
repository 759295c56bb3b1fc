"""Paged KV cache + paged decode attention parity."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.configs import tiny_lm_config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.ops.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_xla,
)
from deepseek_ocr2_tpu.runtime import paged_kv
from deepseek_ocr2_tpu.runtime.kv_cache import make_kv_cache

INTERPRET = jax.default_backend() != "tpu"


def test_paged_kernel_matches_xla_oracle():
    b, hh, d, page, n_pool, max_pages = 3, 4, 128, 128, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, hh, d), jnp.float32)
    k_pages = jax.random.normal(ks[1], (n_pool, hh, page, d), jnp.float32)
    v_pages = jax.random.normal(ks[2], (n_pool, hh, page, d), jnp.float32)
    rng = np.random.default_rng(0)
    tables = jnp.asarray(
        rng.permutation(n_pool)[: b * max_pages].reshape(b, max_pages), jnp.int32
    )
    seq_lens = jnp.asarray([1, page + 7, max_pages * page], jnp.int32)

    want = np.asarray(
        paged_decode_attention_xla(q, k_pages, v_pages, tables, seq_lens, scale=1 / math.sqrt(d))
    )
    got = np.asarray(
        paged_decode_attention(
            q, k_pages, v_pages, tables, seq_lens, scale=1 / math.sqrt(d), interpret=INTERPRET
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_paged_decode_step_matches_ragged():
    """Full paged decode step == contiguous ragged decode step, multi-step."""
    cfg = tiny_lm_config()
    params = jax.tree_util.tree_map(
        jnp.asarray, dsv2.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    )
    b, s = 2, 11
    page = 8
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)

    # Contiguous prefill (shared starting point).
    cap = 32
    cache = make_kv_cache(
        cfg.num_hidden_layers, b, cfg.num_attention_heads, cap, cfg.head_dim, jnp.float32
    )
    hidden, cache = dsv2.lm_forward(params, cfg, embeds, cache, pos=0, is_prefill=True)

    # Build the paged pool from the prefill cache: per slot, contiguous pages.
    n_pages_per = paged_kv.pages_for(cap, page)
    pool = paged_kv.make_paged_kv_cache(
        cfg.num_hidden_layers, 2 * n_pages_per + 1, cfg.num_attention_heads, page,
        cfg.head_dim, jnp.float32,
    )
    # PageAllocator reserves page 0 as scratch, so tables aren't identity.
    alloc = paged_kv.PageAllocator(2 * n_pages_per + 1)
    tables = []
    for slot in range(b):
        pages = alloc.allocate(n_pages_per)
        pool["k"] = paged_kv.write_prompt_pages(
            pool["k"], cache["k"][:, slot : slot + 1], jnp.asarray(pages, jnp.int32), s
        )
        pool["v"] = paged_kv.write_prompt_pages(
            pool["v"], cache["v"][:, slot : slot + 1], jnp.asarray(pages, jnp.int32), s
        )
        tables.append(pages)
    tables = jnp.asarray(tables, jnp.int32)

    # Step both implementations for a few tokens.
    tok = jnp.argmax(dsv2.logits_last(params, hidden), axis=-1).astype(jnp.int32)
    pos = jnp.full((b,), s, jnp.int32)
    for step in range(4):
        emb = jnp.take(params["embed"], tok, axis=0)[:, None, :]
        h_ref, cache = dsv2.lm_decode_step_ragged(params, cfg, emb, cache, pos)
        h_paged, pool = paged_kv.lm_decode_step_paged(
            params, cfg, emb, pool, tables, pos, use_pallas=False
        )
        np.testing.assert_allclose(
            np.asarray(h_paged), np.asarray(h_ref), rtol=2e-4, atol=2e-4, err_msg=str(step)
        )
        logits = dsv2.logits_last(params, h_ref)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos = pos + 1


def test_paged_pool_kernel_matches_layer_slice():
    """Pool-reading kernel (layer index via scalar prefetch) == slicing the
    layer out of the pool and running the 4D kernel's XLA oracle."""
    from deepseek_ocr2_tpu.ops.paged_attention import paged_decode_attention_pool

    n_layers, b, hh, d, page, n_pool, max_pages = 3, 2, 4, 128, 128, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, hh, d), jnp.float32)
    k_pool = jax.random.normal(ks[1], (n_layers, n_pool, hh, page, d), jnp.float32)
    v_pool = jax.random.normal(ks[2], (n_layers, n_pool, hh, page, d), jnp.float32)
    rng = np.random.default_rng(3)
    tables = jnp.asarray(
        rng.permutation(n_pool)[: b * max_pages].reshape(b, max_pages), jnp.int32
    )
    seq_lens = jnp.asarray([page + 3, max_pages * page], jnp.int32)

    for li in range(n_layers):
        want = np.asarray(
            paged_decode_attention_xla(
                q, k_pool[li], v_pool[li], tables, seq_lens, scale=1 / math.sqrt(d)
            )
        )
        got = np.asarray(
            paged_decode_attention_pool(
                q, k_pool, v_pool, tables, seq_lens, jnp.int32(li),
                scale=1 / math.sqrt(d), interpret=INTERPRET,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5, err_msg=f"layer {li}")


def test_paged_pool_chunk_kernel_matches_oracles():
    """Chunk-query pool kernel == XLA gather oracle == per-query 1-token
    kernel calls (each chunk query with its own causal budget)."""
    from deepseek_ocr2_tpu.ops.paged_attention import (
        paged_decode_attention_pool_chunk,
        paged_decode_attention_xla_chunk,
    )

    n_layers, b, s_q, hh, d, page, n_pool, max_pages = 2, 3, 4, 4, 128, 64, 24, 5
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, s_q, hh, d), jnp.float32)
    k_pool = jax.random.normal(ks[1], (n_layers, n_pool, hh, page, d), jnp.float32)
    v_pool = jax.random.normal(ks[2], (n_layers, n_pool, hh, page, d), jnp.float32)
    rng = np.random.default_rng(7)
    tables = jnp.asarray(
        rng.permutation(n_pool)[: b * max_pages].reshape(b, max_pages), jnp.int32
    )
    # Per-query budgets: query i sits one position after i-1 (rows at very
    # different lengths, crossing page boundaries).
    base = jnp.asarray([1, page - 2, 3 * page + 5], jnp.int32)
    seq_lens = base[:, None] + jnp.arange(s_q, dtype=jnp.int32)[None, :]

    for li in range(n_layers):
        want = np.asarray(
            paged_decode_attention_xla_chunk(
                q, k_pool[li], v_pool[li], tables, seq_lens, scale=1 / math.sqrt(d)
            )
        )
        got = np.asarray(
            paged_decode_attention_pool_chunk(
                q, k_pool, v_pool, tables, seq_lens, jnp.int32(li),
                scale=1 / math.sqrt(d), interpret=INTERPRET,
            )
        )
        np.testing.assert_allclose(
            got, want, rtol=2e-5, atol=2e-5, err_msg=f"layer {li}"
        )
        # Cross-check each query against the single-token kernel.
        from deepseek_ocr2_tpu.ops.paged_attention import paged_decode_attention

        for i in range(s_q):
            one = np.asarray(
                paged_decode_attention(
                    q[:, i], k_pool[li], v_pool[li], tables, seq_lens[:, i],
                    scale=1 / math.sqrt(d), interpret=INTERPRET,
                )
            )
            np.testing.assert_allclose(
                got[:, i], one, rtol=2e-5, atol=2e-5, err_msg=f"layer {li} q {i}"
            )


def test_paged_chunk_step_matches_single_steps():
    """lm_decode_step_paged with S>1 (speculative chunk) == S sequential
    1-token paged steps when the fed tokens coincide (full acceptance)."""
    cfg = tiny_lm_config()
    params = jax.tree_util.tree_map(
        jnp.asarray, dsv2.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    )
    b, s, page, chunk = 2, 9, 8, 3
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)

    cap = 32
    cache = make_kv_cache(
        cfg.num_hidden_layers, b, cfg.num_attention_heads, cap, cfg.head_dim, jnp.float32
    )
    _, cache = dsv2.lm_forward(params, cfg, embeds, cache, pos=0, is_prefill=True)

    n_pages_per = paged_kv.pages_for(cap, page)
    n_pool = 2 * n_pages_per + 1
    pool_a = paged_kv.make_paged_kv_cache(
        cfg.num_hidden_layers, n_pool, cfg.num_attention_heads, page, cfg.head_dim,
        jnp.float32,
    )
    alloc = paged_kv.PageAllocator(n_pool)
    tables = []
    for slot in range(b):
        pages = alloc.allocate(n_pages_per)
        for key in ("k", "v"):
            pool_a[key] = paged_kv.write_prompt_pages(
                pool_a[key], cache[key][:, slot : slot + 1],
                jnp.asarray(pages, jnp.int32), s,
            )
        tables.append(pages)
    tables = jnp.asarray(tables, jnp.int32)
    pool_b = jax.tree_util.tree_map(lambda a: a, pool_a)

    # Feed the same `chunk` token ids both ways from per-row ragged starts.
    feed = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, chunk)), jnp.int32)
    pos0 = jnp.asarray([s, s - 3], jnp.int32)

    emb = jnp.take(params["embed"], feed, axis=0)  # [B, chunk, H]
    h_chunk, pool_a = paged_kv.lm_decode_step_paged(
        params, cfg, emb, pool_a, tables, pos0, use_pallas=False
    )

    outs = []
    for i in range(chunk):
        emb_i = jnp.take(params["embed"], feed[:, i], axis=0)[:, None, :]
        h_i, pool_b = paged_kv.lm_decode_step_paged(
            params, cfg, emb_i, pool_b, tables, pos0 + i, use_pallas=False
        )
        outs.append(np.asarray(h_i[:, 0]))

    np.testing.assert_allclose(
        np.asarray(h_chunk), np.stack(outs, axis=1), rtol=2e-4, atol=2e-4
    )
    # K/V entries cascade the same chunk-width GEMM rounding as the hidden
    # states (XLA fuses the s=3 and s=1 elementwise chains differently).
    for key in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(pool_a[key]), np.asarray(pool_b[key]), rtol=2e-4, atol=2e-4
        )


def test_quantize_kv_error_bound():
    from deepseek_ocr2_tpu.runtime.paged_kv import quantize_kv

    x = jax.random.normal(jax.random.PRNGKey(0), (5, 7, 128), jnp.float32) * 3.0
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (5, 7)
    deq = q.astype(jnp.float32) * s[..., None]
    absmax = np.abs(np.asarray(x)).max(-1)
    # symmetric round-to-nearest: |err| <= scale/2 = absmax/254
    err = np.abs(np.asarray(deq) - np.asarray(x))
    assert (err <= absmax[..., None] / 254 + 1e-7).all()


def test_paged_pool_q8_kernels_match_dequant_oracle():
    """int8 pool kernels (1-query + chunk) == the f32 kernels run on the
    dequantized pool (same math, half the page bytes)."""
    from deepseek_ocr2_tpu.ops.paged_attention import (
        dequant_pages,
        paged_decode_attention_pool_chunk_q8,
        paged_decode_attention_pool_q8,
        paged_decode_attention_xla,
        paged_decode_attention_xla_chunk,
    )
    from deepseek_ocr2_tpu.runtime.paged_kv import quantize_kv

    n_layers, b, s_q, hh, d, page, n_pool, max_pages = 2, 3, 3, 4, 128, 64, 24, 5
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    qs = jax.random.normal(ks[0], (b, s_q, hh, d), jnp.float32)
    kf = jax.random.normal(ks[1], (n_layers, n_pool, hh, page, d), jnp.float32)
    vf = jax.random.normal(ks[2], (n_layers, n_pool, hh, page, d), jnp.float32)
    k_i8, k_sc = quantize_kv(kf)
    v_i8, v_sc = quantize_kv(vf)
    k_deq = dequant_pages(k_i8, k_sc)
    v_deq = dequant_pages(v_i8, v_sc)
    rng = np.random.default_rng(11)
    tables = jnp.asarray(
        rng.permutation(n_pool)[: b * max_pages].reshape(b, max_pages), jnp.int32
    )

    # 1-query
    seq1 = jnp.asarray([1, page + 5, 4 * page], jnp.int32)
    for li in range(n_layers):
        want = paged_decode_attention_xla(
            qs[:, 0], k_deq[li], v_deq[li], tables, seq1, scale=1 / math.sqrt(d)
        )
        got = paged_decode_attention_pool_q8(
            qs[:, 0], k_i8, v_i8, k_sc, v_sc, tables, seq1, jnp.int32(li),
            scale=1 / math.sqrt(d), interpret=INTERPRET,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"1q layer {li}",
        )

    # chunk queries with per-query budgets
    base = jnp.asarray([2, page - 1, 3 * page + 4], jnp.int32)
    seqc = base[:, None] + jnp.arange(s_q, dtype=jnp.int32)[None, :]
    for li in range(n_layers):
        want = paged_decode_attention_xla_chunk(
            qs, k_deq[li], v_deq[li], tables, seqc, scale=1 / math.sqrt(d)
        )
        got = paged_decode_attention_pool_chunk_q8(
            qs, k_i8, v_i8, k_sc, v_sc, tables, seqc, jnp.int32(li),
            scale=1 / math.sqrt(d), interpret=INTERPRET,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"chunk layer {li}",
        )


def test_paged_decode_step_int8_close_to_f32():
    """Full paged decode step on an int8 pool tracks the f32 pool within
    quantization noise (per-vector absmax int8: ~0.4% RMS on K/V)."""
    cfg = tiny_lm_config()
    params = jax.tree_util.tree_map(
        jnp.asarray, dsv2.init_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    )
    b, s, page = 2, 10, 8
    rng = np.random.default_rng(8)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)

    cap = 32
    cache = make_kv_cache(
        cfg.num_hidden_layers, b, cfg.num_attention_heads, cap, cfg.head_dim,
        jnp.float32,
    )
    _, cache = dsv2.lm_forward(params, cfg, embeds, cache, pos=0, is_prefill=True)

    n_pages_per = paged_kv.pages_for(cap, page)
    n_pool = 2 * n_pages_per + 1
    tables = jnp.asarray(
        np.arange(1, 2 * n_pages_per + 1, dtype=np.int32).reshape(b, n_pages_per)
    )
    pools = {}
    for dt in ("float32", "int8"):
        pool = paged_kv.make_paged_kv_cache(
            cfg.num_hidden_layers, n_pool, cfg.num_attention_heads, page,
            cfg.head_dim, jnp.dtype(dt),
        )
        pools[dt] = paged_kv.write_prompt_pool_batched(
            pool,
            cache["k"].reshape(cfg.num_hidden_layers, b, cfg.num_attention_heads, cap, cfg.head_dim),
            cache["v"].reshape(cfg.num_hidden_layers, b, cfg.num_attention_heads, cap, cfg.head_dim),
            jnp.asarray(
                np.arange(1, 2 * n_pages_per + 1, dtype=np.int32).reshape(
                    b, n_pages_per
                )
            ),
            s,
        )

    feed = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
    emb = jnp.take(params["embed"], feed, axis=0)[:, None, :]
    pos = jnp.full((b,), s, jnp.int32)
    h_f32, _ = paged_kv.lm_decode_step_paged(
        params, cfg, emb, pools["float32"], tables, pos, use_pallas=False
    )
    h_q8, _ = paged_kv.lm_decode_step_paged(
        params, cfg, emb, pools["int8"], tables, pos, use_pallas=False
    )
    a, bb = np.asarray(h_f32), np.asarray(h_q8)
    denom = np.abs(a).mean()
    assert np.abs(a - bb).mean() / denom < 0.05, np.abs(a - bb).mean() / denom


def test_int8_pool_attention_drift_at_long_context():
    """Quantify int8-KV attention drift at the sequence length the pool
    exists for (2k context, BASELINE config #5) — the r3 docs asserted a
    per-element bound but never measured the aggregate effect at length.

    The context output over a 2048-token int8 pool must track the exact
    f32 pool within ~1% relative error: per-vector absmax int8 has ~0.23%
    RMS error per K/V element, softmax averaging over 2k keys keeps the
    aggregate at the same order (errors are independent, not additive).
    The end-to-end TOKEN divergence is measured on hardware by
    scripts/bench_serve_long.py (greedy flips depend on logit margins,
    which synthetic weights make pathologically tight)."""
    from deepseek_ocr2_tpu.ops.paged_attention import (
        dequant_pages,
        paged_decode_attention_xla,
    )
    from deepseek_ocr2_tpu.runtime.paged_kv import quantize_kv

    b, hh, d, page = 2, 4, 128, 128
    seq = 2048
    n_pool = b * (seq // page) + 1
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    q = jax.random.normal(ks[0], (b, hh, d), jnp.float32)
    kf = jax.random.normal(ks[1], (n_pool, hh, page, d), jnp.float32)
    vf = jax.random.normal(ks[2], (n_pool, hh, page, d), jnp.float32)
    k_i8, k_sc = quantize_kv(kf)
    v_i8, v_sc = quantize_kv(vf)
    tables = jnp.asarray(
        np.arange(1, n_pool).reshape(b, seq // page), jnp.int32
    )
    seq_lens = jnp.asarray([seq, seq - 37], jnp.int32)
    want = paged_decode_attention_xla(
        q, kf, vf, tables, seq_lens, scale=1 / math.sqrt(d)
    )
    got = paged_decode_attention_xla(
        q,
        dequant_pages(k_i8, k_sc),
        dequant_pages(v_i8, v_sc),
        tables,
        seq_lens,
        scale=1 / math.sqrt(d),
    )
    w = np.asarray(want)
    g = np.asarray(got)
    rel = np.abs(g - w).max() / (np.abs(w).max() + 1e-9)
    assert rel < 1e-2, f"int8 pool drift {rel:.3%} at seq {seq}"
