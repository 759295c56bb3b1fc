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


def test_int8tail_last_page_exact_1query_and_chunk():
    """int8tail pool semantics (VERDICT r4 #7): the row's LAST page must be
    read from the bf16 open-page buffer, not the quantized pool. Proven by
    poisoning the quantized pool's last-page contents with garbage: the
    tail kernels must match an oracle built from (dequantized history +
    exact bf16 tail), for both the 1-query and chunk kernels."""
    import math

    from deepseek_ocr2_tpu.ops.paged_attention import (
        dequant_pages,
        paged_decode_attention_pool_chunk_q8,
        paged_decode_attention_pool_q8,
        paged_decode_attention_xla,
        paged_decode_attention_xla_chunk,
    )
    from deepseek_ocr2_tpu.runtime.paged_kv import quantize_kv

    rng = np.random.default_rng(11)
    L, b, hh, d, page = 2, 2, 3, 128, 16
    n_pages_per = 3
    n_pool = b * n_pages_per + 1
    li = 1
    seq_lens = np.asarray([41, 25], np.int32)  # last pages 2 and 1, partial
    kf = rng.standard_normal((L, n_pool, hh, page, d)).astype(np.float32)
    vf = rng.standard_normal((L, n_pool, hh, page, d)).astype(np.float32)
    k_i8, k_sc = quantize_kv(jnp.asarray(kf))
    v_i8, v_sc = quantize_kv(jnp.asarray(vf))
    tables = jnp.asarray(
        np.arange(1, n_pool).reshape(b, n_pages_per), jnp.int32
    )
    # Exact open pages (bf16) = the true values; then POISON the quantized
    # pool's last pages so any read from them is loud.
    open_k = np.zeros((L, b, hh, page, d), np.float32)
    open_v = np.zeros((L, b, hh, page, d), np.float32)
    k_pois = np.array(np.asarray(k_i8))
    v_pois = np.array(np.asarray(v_i8))
    for r in range(b):
        lp = (seq_lens[r] - 1) // page
        pg = int(np.asarray(tables)[r, lp])
        open_k[:, r] = kf[:, pg]
        open_v[:, r] = vf[:, pg]
        k_pois[:, pg] = 127
        v_pois[:, pg] = -127
    open_k = jnp.asarray(open_k, jnp.bfloat16)
    open_v = jnp.asarray(open_v, jnp.bfloat16)
    k_i8, v_i8 = jnp.asarray(k_pois), jnp.asarray(v_pois)

    # Oracle: dequant history + exact (bf16-rounded) tail pages.
    k_layer = dequant_pages(k_i8[li], k_sc[li])
    v_layer = dequant_pages(v_i8[li], v_sc[li])
    rows = jnp.arange(b)
    last_pg = tables[rows, (jnp.asarray(seq_lens) - 1) // page]
    k_layer = k_layer.at[last_pg].set(open_k[li].astype(jnp.float32))
    v_layer = v_layer.at[last_pg].set(open_v[li].astype(jnp.float32))

    scale = 1 / math.sqrt(d)
    q = jnp.asarray(rng.standard_normal((b, hh, d)), jnp.float32)
    want = np.asarray(
        paged_decode_attention_xla(
            q, k_layer, v_layer, tables, jnp.asarray(seq_lens), scale=scale
        )
    )
    got = np.asarray(
        paged_decode_attention_pool_q8(
            q, k_i8, v_i8, k_sc, v_sc, tables, jnp.asarray(seq_lens), li,
            scale=scale, open_k=open_k, open_v=open_v, interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # Chunk kernel: per-query budgets ending inside the row's last page.
    s_q = 3
    qc = jnp.asarray(rng.standard_normal((b, s_q, hh, d)), jnp.float32)
    budgets = jnp.asarray(
        np.stack([seq_lens - 2, seq_lens - 1, seq_lens], 1), jnp.int32
    )
    want_c = np.asarray(
        paged_decode_attention_xla_chunk(
            qc, k_layer, v_layer, tables, budgets, scale=scale
        )
    )
    got_c = np.asarray(
        paged_decode_attention_pool_chunk_q8(
            qc, k_i8, v_i8, k_sc, v_sc, tables, budgets, li,
            scale=scale, open_k=open_k, open_v=open_v, interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got_c, want_c, rtol=2e-5, atol=2e-5)


def test_int8tail_reduces_drift_vs_int8():
    """With attention mass on the newest tokens (the usual decode regime),
    the exact tail must cut output error vs the plain int8 pool."""
    import math

    from deepseek_ocr2_tpu.ops.paged_attention import (
        dequant_pages,
        paged_decode_attention_xla,
    )
    from deepseek_ocr2_tpu.runtime.paged_kv import quantize_kv

    rng = np.random.default_rng(5)
    b, hh, d, page = 2, 4, 128, 64
    seq = 512
    n_pool = b * (seq // page) + 1
    kf = rng.standard_normal((n_pool, hh, page, d)).astype(np.float32)
    vf = rng.standard_normal((n_pool, hh, page, d)).astype(np.float32)
    tables = jnp.asarray(np.arange(1, n_pool).reshape(b, seq // page), jnp.int32)
    seq_lens = jnp.asarray([seq, seq - 17], jnp.int32)
    # Queries aligned with the newest keys -> softmax mass concentrates on
    # the last page.
    qn = np.empty((b, hh, d), np.float32)
    for r in range(b):
        lastpos = int(np.asarray(seq_lens)[r]) - 1
        pg = int(np.asarray(tables)[r, lastpos // page])
        qn[r] = kf[pg, :, lastpos % page, :] * 2.0
    q = jnp.asarray(qn)
    scale = 1 / math.sqrt(d)

    want = np.asarray(
        paged_decode_attention_xla(
            q, jnp.asarray(kf), jnp.asarray(vf), tables, seq_lens, scale=scale
        )
    )
    k_i8, k_sc = quantize_kv(jnp.asarray(kf))
    v_i8, v_sc = quantize_kv(jnp.asarray(vf))
    kq = dequant_pages(k_i8, k_sc)
    vq = dequant_pages(v_i8, v_sc)
    got_int8 = np.asarray(
        paged_decode_attention_xla(q, kq, vq, tables, seq_lens, scale=scale)
    )
    # int8tail oracle: exact (bf16) last pages over int8 history.
    rows = jnp.arange(b)
    last_pg = tables[rows, (seq_lens - 1) // page]
    k_tail = kq.at[last_pg].set(
        jnp.asarray(kf)[last_pg].astype(jnp.bfloat16).astype(jnp.float32)
    )
    v_tail = vq.at[last_pg].set(
        jnp.asarray(vf)[last_pg].astype(jnp.bfloat16).astype(jnp.float32)
    )
    got_tail = np.asarray(
        paged_decode_attention_xla(q, k_tail, v_tail, tables, seq_lens, scale=scale)
    )
    err8 = np.abs(got_int8 - want).max()
    errt = np.abs(got_tail - want).max()
    assert errt < 0.5 * err8, (errt, err8)
