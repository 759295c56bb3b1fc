"""Pallas paged decode attention (vLLM-style block tables, TPU-native).

The serving tier stores K/V in fixed-size pages drawn from a shared pool;
each sequence owns a block table of page ids. This kernel computes one
decode step's attention by walking a sequence's block table with
scalar-prefetched indices — the page id feeds the BlockSpec index_map, so
each grid step DMAs exactly one page from HBM and accumulates a streaming
(flash) softmax in VMEM scratch.

Numeric policy matches the dense decode path: scores and softmax in f32,
invalid keys masked to -inf (padding contributes exactly zero).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _flash_heads_step(
    q_ref, k, v, m_ref, l_ref, acc_ref, seq_budget, k_pos, *, scale, n_heads
):
    """Shared per-page online-softmax update over ALL heads of one page.

    k/v: [Hh, page, D] f32 (already dequantized); q_ref block [1, Hh, D];
    scratch m/l [Hh, 1] SMEM, acc [Hh, D] VMEM. `seq_budget` is either a
    scalar (1-query) broadcast over heads or handled by the caller (chunk).
    Heads are a static python loop — one grid step DMAs the whole page
    across heads (the old (b, heads, pages) grid paid the ~us per-grid-step
    fixed cost 10x over, 8+ ms/step at 2k context; see docs/DESIGN.md
    round-4c)."""
    for h in range(n_heads):
        q = q_ref[0, h].astype(jnp.float32).reshape(1, -1)  # [1, D]
        s = jax.lax.dot_general(
            q, k[h], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)  # [1, page]
        s = jnp.where(k_pos < seq_budget, s, jnp.float32(NEG_INF))
        m_old = m_ref[h, 0]
        m_new = jnp.maximum(m_old, jnp.max(s))
        alpha = jnp.exp(m_old - m_new)
        p_ij = jnp.exp(s - m_new)  # [1, page]
        l_ref[h, 0] = alpha * l_ref[h, 0] + jnp.sum(p_ij)
        acc_ref[h : h + 1, :] = acc_ref[h : h + 1, :] * alpha + jax.lax.dot_general(
            p_ij, v[h], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[h, 0] = m_new


def _paged_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, max_pages] i32
    seq_lens_ref,  # [B] i32
    # inputs
    q_ref,  # [1, Hh, D]
    k_ref,  # [1, Hh, page, D] (page selected via index_map)
    v_ref,
    # outputs
    o_ref,  # [1, Hh, D]
    # scratch
    m_ref,  # [Hh, 1] f32 SMEM
    l_ref,  # [Hh, 1] f32 SMEM
    acc_ref,  # [Hh, D] f32
    *,
    scale: float,
    page_size: int,
    n_heads: int,
):
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)

    @pl.when(p == 0)
    def _():
        for h in range(n_heads):
            m_ref[h, 0] = NEG_INF
            l_ref[h, 0] = 0.0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[b]

    @pl.when(p * page_size < seq_len)
    def _():
        k = k_ref[0].astype(jnp.float32)  # [Hh, page, D]
        v = v_ref[0].astype(jnp.float32)
        k_pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )
        _flash_heads_step(
            q_ref, k, v, m_ref, l_ref, acc_ref, seq_len, k_pos,
            scale=scale, n_heads=n_heads,
        )

    @pl.when(p == n_pages - 1)
    def _():
        for h in range(n_heads):
            denom = jnp.maximum(l_ref[h, 0], 1e-37)
            o_ref[0, h] = (acc_ref[h] / denom).astype(o_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,  # [B, Hh, D] query for the new token
    k_pages: jnp.ndarray,  # [P, Hh, page, D] page pool
    v_pages: jnp.ndarray,  # [P, Hh, page, D]
    block_tables: jnp.ndarray,  # [B, max_pages] i32
    seq_lens: jnp.ndarray,  # [B] i32 (valid keys, including the new token)
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Streaming-softmax attention over paged K/V. Returns [B, Hh, D] f32."""
    b, hh, d = q.shape
    max_pages = block_tables.shape[1]
    page_size = k_pages.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec(
                (1, hh, d), lambda bi, pi, bt, sl: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hh, page_size, d),
                lambda bi, pi, bt, sl: (bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hh, page_size, d),
                lambda bi, pi, bt, sl: (bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hh, d), lambda bi, pi, bt, sl: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((hh, 1), jnp.float32),
            pltpu.SMEM((hh, 1), jnp.float32),
            pltpu.VMEM((hh, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_kernel, scale=scale, page_size=page_size, n_heads=hh
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, d), jnp.float32),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32), q, k_pages, v_pages)


def _paged_kernel_pool(
    # scalar prefetch
    block_tables_ref,  # [B, max_pages] i32
    seq_lens_ref,  # [B] i32
    layer_ref,  # [1] i32
    # inputs
    q_ref,  # [1, Hh, D]
    k_ref,  # [1, 1, Hh, page, D] (layer + page selected via index_map)
    v_ref,
    # outputs
    o_ref,  # [1, Hh, D]
    # scratch
    m_ref,  # [Hh, 1] f32 SMEM
    l_ref,  # [Hh, 1] f32 SMEM
    acc_ref,  # [Hh, D] f32
    *,
    scale: float,
    page_size: int,
    n_heads: int,
):
    del layer_ref  # consumed by the index_map only
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)

    @pl.when(p == 0)
    def _():
        for h in range(n_heads):
            m_ref[h, 0] = NEG_INF
            l_ref[h, 0] = 0.0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[b]

    @pl.when(p * page_size < seq_len)
    def _():
        k = k_ref[0, 0].astype(jnp.float32)  # [Hh, page, D]
        v = v_ref[0, 0].astype(jnp.float32)
        k_pos = p * page_size + jax.lax.broadcasted_iota(jnp.int32, (1, page_size), 1)
        _flash_heads_step(
            q_ref, k, v, m_ref, l_ref, acc_ref, seq_len, k_pos,
            scale=scale, n_heads=n_heads,
        )

    @pl.when(p == n_pages - 1)
    def _():
        for h in range(n_heads):
            denom = jnp.maximum(l_ref[h, 0], 1e-37)
            o_ref[0, h] = (acc_ref[h] / denom).astype(o_ref.dtype)


def paged_decode_attention_pool(
    q: jnp.ndarray,  # [B, Hh, D]
    k_pool: jnp.ndarray,  # [L, P, Hh, page, D] full layer-stacked pool
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages] i32
    seq_lens: jnp.ndarray,  # [B] i32
    layer,  # scalar i32 layer index
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged decode attention reading straight from the full [L, P, ...] pool.

    The layer index rides scalar prefetch into the BlockSpec index_map, so no
    [P, ...] layer slice is ever materialized in HBM — the kernel DMAs exactly
    the block-table pages of the selected layer (the per-layer slice copy was
    the dominant decode cost for large pools; see docs/DESIGN.md).
    """
    b, hh, d = q.shape
    max_pages = block_tables.shape[1]
    page_size = k_pool.shape[3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec(
                (1, hh, d), lambda bi, pi, bt, sl, ly: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hh, page_size, d),
                lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, page_size, d),
                lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hh, d), lambda bi, pi, bt, sl, ly: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((hh, 1), jnp.float32),
            pltpu.SMEM((hh, 1), jnp.float32),
            pltpu.VMEM((hh, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_kernel_pool, scale=scale, page_size=page_size, n_heads=hh
    )
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, d), jnp.float32),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        layer_arr,
        q,
        k_pool,
        v_pool,
    )


def _chunk_heads_step(
    q_ref, k, v, m_ref, l_ref, acc_ref, budget, k_pos, *, scale, n_heads, n_queries
):
    """Per-page chunk-query update over all heads. q_ref block [1, Hh, S, D];
    k/v [Hh, page, D] f32; scratch m/l [Hh*S, 1], acc [Hh*S, D] — head h's
    rows are the static slice [h*S, (h+1)*S)."""
    s_q = n_queries
    for h in range(n_heads):
        q = q_ref[0, h].astype(jnp.float32)  # [S, D]
        s = jax.lax.dot_general(
            q, k[h], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)  # [S, page]
        s = jnp.where(k_pos < budget, s, jnp.float32(NEG_INF))
        lo = h * s_q
        m_old = m_ref[lo : lo + s_q, :]  # [S, 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p_ij = jnp.exp(s - m_new)  # [S, page]
        l_ref[lo : lo + s_q, :] = alpha * l_ref[lo : lo + s_q, :] + jnp.sum(
            p_ij, axis=1, keepdims=True
        )
        acc_ref[lo : lo + s_q, :] = acc_ref[lo : lo + s_q, :] * alpha + jax.lax.dot_general(
            p_ij, v[h], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[lo : lo + s_q, :] = m_new


def _paged_kernel_pool_chunk(
    # scalar prefetch
    block_tables_ref,  # [B, max_pages] i32
    seq_lens_ref,  # [B, S] i32 per-query valid-key counts
    layer_ref,  # [1] i32
    # inputs
    q_ref,  # [1, Hh, S, D]
    k_ref,  # [1, 1, Hh, page, D] (layer + page selected via index_map)
    v_ref,
    # outputs
    o_ref,  # [1, Hh, S, D]
    # scratch
    m_ref,  # [Hh*S, 1] f32 VMEM
    l_ref,  # [Hh*S, 1] f32 VMEM
    acc_ref,  # [Hh*S, D] f32 VMEM
    *,
    scale: float,
    page_size: int,
    n_queries: int,
    n_heads: int,
):
    """Chunk-query variant of _paged_kernel_pool (speculative verification).

    All S queries of a row share the row's pages, so each (row, page) grid
    step runs ONE [S, page] score dot per head against the page; per-query
    causal budgets arrive as seq_lens[b, i] (query i of row b attends keys
    < seq_lens[b, i])."""
    del layer_ref  # consumed by the index_map only
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Budgets are nondecreasing in i (query i sits one position after i-1),
    # but take an explicit max so the guard never depends on that.
    max_len = seq_lens_ref[b, 0]
    for i in range(1, n_queries):
        max_len = jnp.maximum(max_len, seq_lens_ref[b, i])

    @pl.when(p * page_size < max_len)
    def _():
        k = k_ref[0, 0].astype(jnp.float32)  # [Hh, page, D]
        v = v_ref[0, 0].astype(jnp.float32)
        budget = jnp.concatenate(
            [seq_lens_ref[b, i].reshape(1, 1) for i in range(n_queries)], axis=0
        )  # [S, 1]
        k_pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )  # [1, page]
        _chunk_heads_step(
            q_ref, k, v, m_ref, l_ref, acc_ref, budget, k_pos,
            scale=scale, n_heads=n_heads, n_queries=n_queries,
        )

    @pl.when(p == n_pages - 1)
    def _():
        for h in range(n_heads):
            lo = h * n_queries
            denom = jnp.maximum(l_ref[lo : lo + n_queries, :], 1e-37)
            o_ref[0, h] = (acc_ref[lo : lo + n_queries, :] / denom).astype(o_ref.dtype)


def paged_decode_attention_pool_chunk(
    q: jnp.ndarray,  # [B, S, Hh, D] chunk queries (last token + drafts)
    k_pool: jnp.ndarray,  # [L, P, Hh, page, D] full layer-stacked pool
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages] i32
    seq_lens: jnp.ndarray,  # [B, S] i32 per-query valid-key counts
    layer,  # scalar i32 layer index
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged pool attention for S speculative queries per row.

    Same streaming-softmax walk as paged_decode_attention_pool, but each
    (row, head, page) grid step scores all S chunk queries in one dot; each
    query i applies its own causal budget seq_lens[b, i] (= its absolute
    position + 1), so draft position i sees exactly its causal prefix.
    Returns [B, S, Hh, D] f32.
    """
    b, s_q, hh, d = q.shape
    max_pages = block_tables.shape[1]
    page_size = k_pool.shape[3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec(
                (1, hh, s_q, d),
                lambda bi, pi, bt, sl, ly: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, page_size, d),
                lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, page_size, d),
                lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hh, s_q, d),
            lambda bi, pi, bt, sl, ly: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((hh * s_q, 1), jnp.float32),
            pltpu.VMEM((hh * s_q, 1), jnp.float32),
            pltpu.VMEM((hh * s_q, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_kernel_pool_chunk,
        scale=scale,
        page_size=page_size,
        n_queries=s_q,
        n_heads=hh,
    )
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, s_q, d), jnp.float32),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        layer_arr,
        q.transpose(0, 2, 1, 3),  # [B, Hh, S, D] — legal block tiling
        k_pool,
        v_pool,
    )
    return out.transpose(0, 2, 1, 3)  # [B, S, Hh, D]


def paged_decode_attention_xla_chunk(
    q, k_pages, v_pages, block_tables, seq_lens, *, scale
) -> jnp.ndarray:
    """XLA chunk-query reference (gathers pages; oracle + CPU fallback).

    q: [B, S, Hh, D]; seq_lens: [B, S] per-query budgets. Returns
    [B, S, Hh, D] f32.
    """
    b, s_q, hh, d = q.shape
    max_pages = block_tables.shape[1]
    page_size = k_pages.shape[2]
    k = jnp.take(k_pages, block_tables, axis=0)  # [B, max_pages, Hh, page, D]
    v = jnp.take(v_pages, block_tables, axis=0)
    k = k.transpose(0, 2, 1, 3, 4).reshape(b, hh, max_pages * page_size, d)
    v = v.transpose(0, 2, 1, 3, 4).reshape(b, hh, max_pages * page_size, d)
    s = jnp.einsum(
        "bshd,bhkd->bhsk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * jnp.float32(scale)
    k_pos = jnp.arange(max_pages * page_size)[None, None, None, :]
    s = jnp.where(k_pos < seq_lens[:, None, :, None], s, jnp.float32(NEG_INF))
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhsk,bhkd->bshd", w, v.astype(jnp.float32))


def paged_decode_attention_xla(
    q, k_pages, v_pages, block_tables, seq_lens, *, scale
) -> jnp.ndarray:
    """XLA reference path (gathers pages; correctness oracle + CPU fallback)."""
    b, hh, d = q.shape
    max_pages = block_tables.shape[1]
    page_size = k_pages.shape[2]
    # [B, max_pages, Hh, page, D] -> [B, Hh, max_pages*page, D]
    k = jnp.take(k_pages, block_tables, axis=0)
    v = jnp.take(v_pages, block_tables, axis=0)
    k = k.transpose(0, 2, 1, 3, 4).reshape(b, hh, max_pages * page_size, d)
    v = v.transpose(0, 2, 1, 3, 4).reshape(b, hh, max_pages * page_size, d)
    s = jnp.einsum(
        "bhd,bhkd->bhk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * jnp.float32(scale)
    k_pos = jnp.arange(max_pages * page_size)[None, None, :]
    s = jnp.where(k_pos < seq_lens[:, None, None], s, jnp.float32(NEG_INF))
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bhkd->bhd", w, v.astype(jnp.float32))


def _stacked_kernel(
    # scalar prefetch
    layer_ref,  # [1] i32
    seq_lens_ref,  # [B] i32
    # inputs
    q_ref,  # [1, Hh, D]
    k_ref,  # [1, 1, Hh, chunk, D] (layer selected via index_map)
    v_ref,
    # outputs
    o_ref,  # [1, Hh, D]
    # scratch
    m_ref,  # [Hh, 1] f32
    l_ref,  # [Hh, 1] f32
    acc_ref,  # [Hh, D] f32
    *,
    scale: float,
    chunk: int,
):
    del layer_ref  # consumed by the index_map only
    bi = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    n_heads = q_ref.shape[1]

    @pl.when(c == 0)
    def _():
        for hh in range(n_heads):
            m_ref[hh, 0] = NEG_INF
            l_ref[hh, 0] = 0.0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[bi]

    @pl.when(c * chunk < seq_len)
    def _():
        # Mosaic has no batched-dot lowering: unroll the (static) head loop,
        # 1-row dots per head like _paged_kernel. The whole [Hh, chunk, D]
        # block still arrives in ONE DMA per grid step.
        k_pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        for hh in range(n_heads):
            q = q_ref[0, hh].astype(jnp.float32).reshape(1, -1)  # [1, D]
            k = k_ref[0, 0, hh].astype(jnp.float32)  # [chunk, D]
            v = v_ref[0, 0, hh].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * jnp.float32(scale)  # [1, chunk]
            s = jnp.where(k_pos < seq_len, s, jnp.float32(NEG_INF))

            m_old = m_ref[hh, 0]
            m_new = jnp.maximum(m_old, jnp.max(s))
            alpha = jnp.exp(m_old - m_new)
            p_ij = jnp.exp(s - m_new)  # [1, chunk]
            l_ref[hh, 0] = alpha * l_ref[hh, 0] + jnp.sum(p_ij)
            acc_ref[hh : hh + 1] = acc_ref[hh : hh + 1] * alpha + jax.lax.dot_general(
                p_ij, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_ref[hh, 0] = m_new

    @pl.when(c == n_chunks - 1)
    def _():
        for hh in range(n_heads):
            denom = jnp.maximum(l_ref[hh, 0], 1e-37)
            o_ref[0, hh] = (acc_ref[hh] / denom).astype(o_ref.dtype)


def decode_attention_stacked(
    q: jnp.ndarray,  # [B, Hh, D] query for the new token (f32)
    k_all: jnp.ndarray,  # [L, B, Hh, cap, D] contiguous layer-stacked cache
    v_all: jnp.ndarray,
    layer,  # scalar i32 layer index
    seq_lens: jnp.ndarray,  # [B] i32 (valid keys, including the new token)
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode attention straight from the contiguous stacked cache.

    The XLA decode path slices cache[li] out of the carry and writes the
    whole layer back every step — two ~42 MB copies per layer at b=32
    (measured ~870 us/layer of pure copy in the b=32 profile). Here the
    layer index rides scalar prefetch and each grid step processes ALL
    heads of one sequence over a capacity chunk (streaming softmax), so
    the cache is read exactly once per layer and never copied. Returns
    [B, Hh, D] f32.
    """
    b, hh, d = q.shape
    cap = k_all.shape[3]
    chunk = min(cap, 512)
    assert cap % chunk == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, cap // chunk),
        in_specs=[
            pl.BlockSpec(
                (1, hh, d),
                lambda bi, ci, ly, sl: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, chunk, d),
                lambda bi, ci, ly, sl: (ly[0], bi, 0, ci, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, chunk, d),
                lambda bi, ci, ly, sl: (ly[0], bi, 0, ci, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hh, d), lambda bi, ci, ly, sl: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((hh, 1), jnp.float32),
            pltpu.SMEM((hh, 1), jnp.float32),
            pltpu.VMEM((hh, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_stacked_kernel, scale=scale, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, d), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        seq_lens.astype(jnp.int32),
        q,
        k_all,
        v_all,
    )


def _paged_kernel_pool_q8(
    # scalar prefetch
    block_tables_ref,  # [B, max_pages] i32
    seq_lens_ref,  # [B] i32
    layer_ref,  # [1] i32
    # inputs
    q_ref,  # [1, Hh, D]
    k_ref,  # [1, 1, 1, page, D] int8 (layer + page via index_map)
    v_ref,  # int8
    ks_ref,  # [1, 1, 1, 1, page] f32 per-token scales (5D so the block's
    #          last two dims are (1, page) — Mosaic rejects slicing the
    #          second-to-last dim of a [L,P,Hh,page] array to 1)
    vs_ref,
    # outputs (tail mode inserts open_k/open_v refs before these)
    *rest,
    scale: float,
    page_size: int,
    tail: bool = False,
):
    """int8-KV variant of _paged_kernel_pool: pages arrive as int8 plus a
    per-(token, head) f32 scale row; dequant on the VPU feeds the same f32
    streaming-softmax walk at HALF the HBM bytes per page.

    tail=True ('int8tail' pool): each row's LAST page reads from a per-slot
    bf16 open-page buffer instead of the quantized pool — the newest
    <=page_size tokens stay exact while history pays int8 bytes (the int8-KV
    drift mitigation, VERDICT r4 #7). The open block's index map is
    constant in p, so it DMAs once per row."""
    del layer_ref
    if tail:
        ok_ref, ov_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)
    n_heads = q_ref.shape[1]

    @pl.when(p == 0)
    def _():
        for h in range(n_heads):
            m_ref[h, 0] = NEG_INF
            l_ref[h, 0] = 0.0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[b]

    @pl.when(p * page_size < seq_len)
    def _():
        k_pos = p * page_size + jax.lax.broadcasted_iota(jnp.int32, (1, page_size), 1)
        is_open = (seq_len - 1) // page_size == p
        for h in range(n_heads):
            q = q_ref[0, h].astype(jnp.float32).reshape(1, -1)
            ks = ks_ref[0, 0, h].reshape(-1, 1)  # [page, 1] f32
            vs = vs_ref[0, 0, h].reshape(-1, 1)
            k = k_ref[0, 0, h].astype(jnp.float32) * ks  # [page, D]
            v = v_ref[0, 0, h].astype(jnp.float32) * vs
            if tail:
                k = jnp.where(is_open, ok_ref[0, 0, h].astype(jnp.float32), k)
                v = jnp.where(is_open, ov_ref[0, 0, h].astype(jnp.float32), v)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * jnp.float32(scale)
            s = jnp.where(k_pos < seq_len, s, jnp.float32(NEG_INF))
            m_old = m_ref[h, 0]
            m_new = jnp.maximum(m_old, jnp.max(s))
            alpha = jnp.exp(m_old - m_new)
            p_ij = jnp.exp(s - m_new)
            l_ref[h, 0] = alpha * l_ref[h, 0] + jnp.sum(p_ij)
            acc_ref[h : h + 1, :] = acc_ref[h : h + 1, :] * alpha + jax.lax.dot_general(
                p_ij, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_ref[h, 0] = m_new

    @pl.when(p == n_pages - 1)
    def _():
        for h in range(n_heads):
            denom = jnp.maximum(l_ref[h, 0], 1e-37)
            o_ref[0, h] = (acc_ref[h] / denom).astype(o_ref.dtype)


def paged_decode_attention_pool_q8(
    q: jnp.ndarray,  # [B, Hh, D]
    k_pool: jnp.ndarray,  # [L, P, Hh, page, D] int8
    v_pool: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, P, Hh, page] f32
    v_scale: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages] i32
    seq_lens: jnp.ndarray,  # [B] i32
    layer,  # scalar i32
    *,
    scale: float,
    open_k: jnp.ndarray = None,  # [L, B, Hh, page, D] bf16 open-page tails
    open_v: jnp.ndarray = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """paged_decode_attention_pool over an int8-quantized pool. With
    open_k/open_v ('int8tail'), each row's last page reads exact bf16 from
    its per-slot open buffer instead of the quantized pool."""
    b, hh, d = q.shape
    max_pages = block_tables.shape[1]
    page_size = k_pool.shape[3]
    ll, pp = k_scale.shape[0], k_scale.shape[1]
    tail = open_k is not None
    # Contiguous 5D view: blocks of a [L,P,Hh,page] array would have to
    # slice Hh (second-to-last) to 1, which Mosaic rejects; [L,P,Hh,1,page]
    # keeps the last two block dims at (1, page) == array dims.
    k_scale5 = k_scale.reshape(ll, pp, hh, 1, page_size)
    v_scale5 = v_scale.reshape(ll, pp, hh, 1, page_size)

    def scale_spec():
        return pl.BlockSpec(
            (1, 1, hh, 1, page_size),
            lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def open_spec():
        # Constant in pi: the open block DMAs once per row.
        return pl.BlockSpec(
            (1, 1, hh, page_size, d),
            lambda bi, pi, bt, sl, ly: (ly[0], bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec(
                (1, hh, d), lambda bi, pi, bt, sl, ly: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, page_size, d),
                lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, page_size, d),
                lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scale_spec(),
            scale_spec(),
            *([open_spec(), open_spec()] if tail else []),
        ],
        out_specs=pl.BlockSpec(
            (1, hh, d), lambda bi, pi, bt, sl, ly: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.SMEM((hh, 1), jnp.float32),
            pltpu.SMEM((hh, 1), jnp.float32),
            pltpu.VMEM((hh, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_kernel_pool_q8, scale=scale, page_size=page_size, tail=tail
    )
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, d), jnp.float32),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        layer_arr,
        q,
        k_pool,
        v_pool,
        k_scale5,
        v_scale5,
        *([open_k, open_v] if tail else []),
    )


def _paged_kernel_pool_chunk_q8(
    block_tables_ref,
    seq_lens_ref,  # [B, S] i32 per-query budgets
    layer_ref,
    q_ref,  # [1, Hh, S, D]
    k_ref,  # [1, 1, Hh, page, D] int8
    v_ref,
    ks_ref,  # [1, 1, Hh, 1, page] f32 (5D — see _paged_kernel_pool_q8)
    vs_ref,
    *rest,  # tail mode: (open_k, open_v, o, m, l, acc); else (o, m, l, acc)
    scale: float,
    page_size: int,
    n_queries: int,
    n_heads: int,
    tail: bool = False,
):
    """int8-KV variant of _paged_kernel_pool_chunk (speculative chunks).
    tail=True: the row's LAST page (from the row's max budget) reads exact
    bf16 from the per-slot open-page buffer — see _paged_kernel_pool_q8."""
    del layer_ref
    if tail:
        ok_ref, ov_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)
    s_q = n_queries

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    max_len = seq_lens_ref[b, 0]
    for i in range(1, n_queries):
        max_len = jnp.maximum(max_len, seq_lens_ref[b, i])

    @pl.when(p * page_size < max_len)
    def _():
        budget = jnp.concatenate(
            [seq_lens_ref[b, i].reshape(1, 1) for i in range(n_queries)], axis=0
        )
        k_pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )
        is_open = (max_len - 1) // page_size == p
        for h in range(n_heads):
            q = q_ref[0, h].astype(jnp.float32)  # [S, D]
            ks = ks_ref[0, 0, h].reshape(-1, 1)
            vs = vs_ref[0, 0, h].reshape(-1, 1)
            k = k_ref[0, 0, h].astype(jnp.float32) * ks
            v = v_ref[0, 0, h].astype(jnp.float32) * vs
            if tail:
                k = jnp.where(is_open, ok_ref[0, 0, h].astype(jnp.float32), k)
                v = jnp.where(is_open, ov_ref[0, 0, h].astype(jnp.float32), v)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * jnp.float32(scale)
            s = jnp.where(k_pos < budget, s, jnp.float32(NEG_INF))
            lo = h * s_q
            m_old = m_ref[lo : lo + s_q, :]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            p_ij = jnp.exp(s - m_new)
            l_ref[lo : lo + s_q, :] = alpha * l_ref[lo : lo + s_q, :] + jnp.sum(
                p_ij, axis=1, keepdims=True
            )
            acc_ref[lo : lo + s_q, :] = acc_ref[
                lo : lo + s_q, :
            ] * alpha + jax.lax.dot_general(
                p_ij, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_ref[lo : lo + s_q, :] = m_new

    @pl.when(p == n_pages - 1)
    def _():
        for h in range(n_heads):
            lo = h * s_q
            denom = jnp.maximum(l_ref[lo : lo + s_q, :], 1e-37)
            o_ref[0, h] = (acc_ref[lo : lo + s_q, :] / denom).astype(o_ref.dtype)


def paged_decode_attention_pool_chunk_q8(
    q: jnp.ndarray,  # [B, S, Hh, D]
    k_pool: jnp.ndarray,  # [L, P, Hh, page, D] int8
    v_pool: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, P, Hh, page] f32
    v_scale: jnp.ndarray,
    block_tables: jnp.ndarray,
    seq_lens: jnp.ndarray,  # [B, S]
    layer,
    *,
    scale: float,
    open_k: jnp.ndarray = None,  # [L, B, Hh, page, D] bf16 open-page tails
    open_v: jnp.ndarray = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """paged_decode_attention_pool_chunk over an int8-quantized pool. With
    open_k/open_v ('int8tail'), the row's last page reads exact bf16."""
    b, s_q, hh, d = q.shape
    max_pages = block_tables.shape[1]
    page_size = k_pool.shape[3]
    ll, pp = k_scale.shape[0], k_scale.shape[1]
    tail = open_k is not None
    k_scale5 = k_scale.reshape(ll, pp, hh, 1, page_size)
    v_scale5 = v_scale.reshape(ll, pp, hh, 1, page_size)

    def scale_spec():
        return pl.BlockSpec(
            (1, 1, hh, 1, page_size),
            lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def open_spec():
        return pl.BlockSpec(
            (1, 1, hh, page_size, d),
            lambda bi, pi, bt, sl, ly: (ly[0], bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec(
                (1, hh, s_q, d),
                lambda bi, pi, bt, sl, ly: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, page_size, d),
                lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hh, page_size, d),
                lambda bi, pi, bt, sl, ly: (ly[0], bt[bi, pi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scale_spec(),
            scale_spec(),
            *([open_spec(), open_spec()] if tail else []),
        ],
        out_specs=pl.BlockSpec(
            (1, hh, s_q, d),
            lambda bi, pi, bt, sl, ly: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((hh * s_q, 1), jnp.float32),
            pltpu.VMEM((hh * s_q, 1), jnp.float32),
            pltpu.VMEM((hh * s_q, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_kernel_pool_chunk_q8,
        scale=scale,
        page_size=page_size,
        n_queries=s_q,
        n_heads=hh,
        tail=tail,
    )
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, s_q, d), jnp.float32),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        layer_arr,
        q.transpose(0, 2, 1, 3),
        k_pool,
        v_pool,
        k_scale5,
        v_scale5,
        *([open_k, open_v] if tail else []),
    )
    return out.transpose(0, 2, 1, 3)  # [B, S, Hh, D]


def dequant_pages(pages_i8: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """[..., page, D] int8 + [..., page] f32 -> f32 (XLA oracle/fallback)."""
    return pages_i8.astype(jnp.float32) * scales[..., None]
