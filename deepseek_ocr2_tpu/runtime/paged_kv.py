"""Paged KV cache: fixed-size pages from a shared pool + per-slot block tables.

Memory-elastic alternative to the contiguous per-slot cache (kv_cache.py):
sequences of very different lengths share one pool, pages are recycled on
completion, and capacity is bounded by total tokens in flight rather than
slots x max_len. Decode attention over pages runs in the Pallas kernel
(ops/paged_attention.py); page allocation is host-side (the engine owns the
free list).

Page 0 is reserved as a scratch page: finished/empty slots participating in
a batched decode dispatch write their (discarded) K/V there so they can
never clobber a live sequence's pages.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DeepseekV2Config
from ..ops.moe import moe_ffn_decode, route, swiglu
from ..ops.norms import rms_norm
from ..ops.paged_attention import (
    dequant_pages,
    paged_decode_attention_pool,
    paged_decode_attention_pool_chunk,
    paged_decode_attention_pool_chunk_q8,
    paged_decode_attention_pool_q8,
    paged_decode_attention_xla,
    paged_decode_attention_xla_chunk,
)
from ..ops.flash_attention import pallas_enabled
from ..models.deepseek_v2 import (
    _index_tree,
    _o_proj,
    _q8_ffn,
    _q8_layer_weights,
    _qkv_proj,
    _rope_consts,
)

PagedKV = Dict[str, jnp.ndarray]  # {'k': [L, P, Hh, page, D], 'v': ...}
# int8 pools additionally carry {'k_scale','v_scale'}: [L, P, Hh, page] f32
# per-(token, head) symmetric absmax scales.


def make_paged_kv_cache(
    num_layers: int,
    num_pages: int,
    num_heads: int,
    page_size: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    slots: int = 0,
) -> PagedKV:
    """Paged K/V pool. dtype 'int8' builds a QUANTIZED pool: K/V stored as
    int8 with per-(token, head) f32 scales — half the HBM traffic per decode
    step and half the pool memory of bf16 (the byte floor and the preemption
    rate both drop). Opt-in: not token-exact vs the bf16/f32 pools.

    dtype 'int8tail' (string) additionally keeps a per-SLOT bf16 open-page
    buffer ({open_k, open_v}: [L, slots, page, ...]) holding each row's
    newest (partial) page exactly: attention reads the last page from it
    instead of the quantized pool, bounding int8 drift to history tokens
    (the VERDICT r4 #7 mitigation; measured drift table in docs/DESIGN.md).
    Requires `slots` (the engine's decode batch width)."""
    tail = isinstance(dtype, str) and dtype == "int8tail"
    if tail or jnp.dtype(dtype) == jnp.int8:
        shape = (num_layers, num_pages, num_heads, page_size, head_dim)
        sshape = (num_layers, num_pages, num_heads, page_size)
        cache = {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
        }
        if tail:
            if slots <= 0:
                raise ValueError("int8tail pool needs slots= (decode batch width)")
            oshape = (num_layers, slots, num_heads, page_size, head_dim)
            cache["open_k"] = jnp.zeros(oshape, jnp.bfloat16)
            cache["open_v"] = jnp.zeros(oshape, jnp.bfloat16)
        return cache
    shape = (num_layers, num_pages, num_heads, page_size, head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-vector int8 quantization over the trailing (head_dim)
    axis: returns (q int8 [..., D], scale f32 [...]). Max elementwise error
    is scale/2 = absmax/254."""
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


class PageAllocator:
    """Host-side free list over the page pool (page 0 reserved as scratch)."""

    def __init__(self, num_pages: int, reserve_scratch: bool = True):
        self.free: List[int] = list(range(1 if reserve_scratch else 0, num_pages))

    @property
    def n_free(self) -> int:
        return len(self.free)

    def allocate(self, n: int) -> List[int]:
        if n > len(self.free):
            raise RuntimeError(f"page pool exhausted (need {n}, have {len(self.free)})")
        out = self.free[:n]
        del self.free[:n]
        return out

    def release(self, pages: List[int]) -> None:
        self.free.extend(pages)


def pages_for(seq_len: int, page_size: int) -> int:
    return -(-seq_len // page_size)


def write_prompt_pages(
    pool: jnp.ndarray,  # [L, P, Hh, page, D]
    k_prompt: jnp.ndarray,  # [L, 1, Hh, S, D] (from a contiguous prefill cache)
    page_ids: jnp.ndarray,  # [n_pages] i32
    seq_len: int,
) -> jnp.ndarray:
    """Scatter a prompt's K (or V) into its allocated pages."""
    return write_prompt_pages_batched(pool, k_prompt, page_ids[None], seq_len)


def write_prompt_pages_batched(
    pool: jnp.ndarray,  # [L, P, Hh, page, D]
    k_prompt: jnp.ndarray,  # [L, G, Hh, cap, D] (batched contiguous prefill)
    page_ids: jnp.ndarray,  # [G, n_pages] i32
    seq_len: int,
) -> jnp.ndarray:
    """Scatter a same-length admission group's K (or V) into its pages.

    One scatter for the whole group — admission batches of G pages with a
    shared prompt length land in G*n_pages pages in a single dispatch.
    """
    l, g, hh, cap, d = k_prompt.shape
    page = pool.shape[3]
    n_pages = page_ids.shape[1]
    padded = n_pages * page
    assert cap >= padded, (cap, padded)
    kp = k_prompt[:, :, :, :padded, :]  # [L, G, Hh, padded, D]
    kp = kp.reshape(l, g, hh, n_pages, page, d).transpose(0, 1, 3, 2, 4, 5)
    kp = kp.reshape(l, g * n_pages, hh, page, d)
    return pool.at[:, page_ids.reshape(-1)].set(kp.astype(pool.dtype))


def write_prompt_scales_batched(
    spool: jnp.ndarray,  # [L, P, Hh, page] f32
    s_prompt: jnp.ndarray,  # [L, G, Hh, cap] per-token scales
    page_ids: jnp.ndarray,  # [G, n_pages] i32
    seq_len: int,
) -> jnp.ndarray:
    """Scatter an admission group's per-token K/V scales into the int8
    pool's scale planes (same layout walk as write_prompt_pages_batched)."""
    l, g, hh, cap = s_prompt.shape
    page = spool.shape[3]
    n_pages = page_ids.shape[1]
    padded = n_pages * page
    assert cap >= padded, (cap, padded)
    sp = s_prompt[:, :, :, :padded]
    sp = sp.reshape(l, g, hh, n_pages, page).transpose(0, 1, 3, 2, 4)
    sp = sp.reshape(l, g * n_pages, hh, page)
    return spool.at[:, page_ids.reshape(-1)].set(sp.astype(spool.dtype))


def write_prompt_pool_batched(
    cache: PagedKV,
    k_new: jnp.ndarray,  # [L, G, Hh, cap, D] f32/bf16 contiguous prefill K
    v_new: jnp.ndarray,
    page_ids: jnp.ndarray,  # [G, n_pages] i32
    seq_len: int,
    slot_ids: jnp.ndarray = None,  # [G] i32 — required for int8tail pools
) -> PagedKV:
    """Scatter an admission group's prompt K/V into the pool, quantizing on
    the way in when the pool is int8. int8tail pools additionally stage the
    prompt's LAST page (bf16, exact) into the group's open-page slots."""
    if "k_scale" in cache:
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        out = {
            "k": write_prompt_pages_batched(cache["k"], kq, page_ids, seq_len),
            "v": write_prompt_pages_batched(cache["v"], vq, page_ids, seq_len),
            "k_scale": write_prompt_scales_batched(
                cache["k_scale"], ks, page_ids, seq_len
            ),
            "v_scale": write_prompt_scales_batched(
                cache["v_scale"], vs, page_ids, seq_len
            ),
        }
        if "open_k" in cache:
            assert slot_ids is not None, "int8tail prompt write needs slot_ids"
            page = cache["k"].shape[3]
            lp = (seq_len - 1) // page  # static: the group's last page
            sl = lp * page
            out["open_k"] = cache["open_k"].at[:, slot_ids].set(
                k_new[:, :, :, sl : sl + page, :].astype(jnp.bfloat16)
            )
            out["open_v"] = cache["open_v"].at[:, slot_ids].set(
                v_new[:, :, :, sl : sl + page, :].astype(jnp.bfloat16)
            )
        return out
    return {
        "k": write_prompt_pages_batched(cache["k"], k_new, page_ids, seq_len),
        "v": write_prompt_pages_batched(cache["v"], v_new, page_ids, seq_len),
    }


def _pool_write_rows(pool, vals, li, page_ids, off):
    """Write one token per row into the pool via per-row dynamic_update_slice.

    NOT a scatter: `pool.at[li, page_ids, :, off, :].set(...)` with traced
    page indices defeats XLA's in-place carry aliasing and copies the whole
    pool every decode step — measured 2.6 us/step per token of POOL capacity
    per layer (scripts/bench_paged_write_ablate.py: 2.87 ms/layer-step at
    cap 1280 vs 0.42 ms for this DUS chain, b=8). Rows map to distinct
    slots' pages, so the sequential chain is order-independent (finished
    slots all target the scratch page, whose content is never read).

    vals: [B, Hh, D]; pool: [L, P, Hh, page, D].
    """
    zero = jnp.int32(0)
    for r in range(vals.shape[0]):
        pool = jax.lax.dynamic_update_slice(
            pool,
            vals[r].astype(pool.dtype)[None, None, :, None, :],
            (li, page_ids[r], zero, off[r], zero),
        )
    return pool


def _pool_write_rows_scale(spool, vals, li, page_ids, off):
    """Per-row DUS for the int8 pool's scale planes (vals [B, Hh];
    spool [L, P, Hh, page])."""
    zero = jnp.int32(0)
    for r in range(vals.shape[0]):
        spool = jax.lax.dynamic_update_slice(
            spool,
            vals[r].astype(spool.dtype)[None, None, :, None],
            (li, page_ids[r], zero, off[r]),
        )
    return spool


def _pool_write_chunk(pool, vals, li, page_ids, off):
    """Chunk-mode (S>1) per-(row, step) DUS writes; vals [B, S, Hh, D],
    page_ids/off [B, S]. S is the (small, static) speculative chunk width;
    consecutive tokens may cross a page boundary, so each writes its own
    (page, offset)."""
    zero = jnp.int32(0)
    b, s = vals.shape[:2]
    for r in range(b):
        for j in range(s):
            pool = jax.lax.dynamic_update_slice(
                pool,
                vals[r, j].astype(pool.dtype)[None, None, :, None, :],
                (li, page_ids[r, j], zero, off[r, j], zero),
            )
    return pool


def _pool_write_chunk_scale(spool, vals, li, page_ids, off):
    zero = jnp.int32(0)
    b, s = vals.shape[:2]
    for r in range(b):
        for j in range(s):
            spool = jax.lax.dynamic_update_slice(
                spool,
                vals[r, j].astype(spool.dtype)[None, None, :, None],
                (li, page_ids[r, j], zero, off[r, j]),
            )
    return spool


def _paged_attention_step(
    xn: jnp.ndarray,  # [B, S, H] normed input (S==1 plain decode; S>1 chunk)
    attn,  # {"wq","wk","wv","wo"} bf16 or {"wqkv","wo"} q8
    cfg: DeepseekV2Config,
    cache: PagedKV,  # full layer-stacked pool ({k,v} [+ k_scale,v_scale])
    li,  # scalar i32 layer index
    block_tables: jnp.ndarray,  # [B, max_pages]
    pos: jnp.ndarray,  # [B] position of xn[:, 0]
    cos_b: jnp.ndarray,  # broadcastable to [B, Hh, S, D]
    sin_b: jnp.ndarray,
    run_pallas: bool,
) -> Tuple[jnp.ndarray, PagedKV]:
    """QKV + per-slot RoPE + paged KV write + paged attention + out proj.

    Operates on the full pool in place: the K/V write is a per-(row, step)
    scatter and the kernel reads pages straight from the stacked pool via
    the layer index — no [P, ...] layer slice ever materializes (see
    ops/paged_attention.paged_decode_attention_pool).

    Chunk mode (S > 1 — speculative-decode verification): the S draft
    tokens of row b write at pos[b]..pos[b]+S-1 (page boundaries crossed
    via the per-element page/offset scatter); query j's causal budget
    extends to its own absolute position, so each draft sees exactly its
    prefix. Positions whose block-table entry is 0 (beyond a slot's
    allocation, or a finished slot) land in the reserved scratch page and
    are never read by an in-budget query.

    int8 pools ({k_scale, v_scale} present): new K/V quantize on the way in
    (per-(token, head) absmax scales) and the q8 kernels dequant per page on
    the VPU — half the KV bytes per step.
    """
    b, s, h = xn.shape
    nh, d = cfg.num_attention_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(d)

    q, k, v = _qkv_proj(xn, attn, b, s, nh, d, decode=True)

    def rot(t):
        half = t.shape[-1] // 2
        return jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)

    q32 = q.astype(jnp.float32) * cos_b + rot(q.astype(jnp.float32)) * sin_b
    k32 = k.astype(jnp.float32) * cos_b + rot(k.astype(jnp.float32)) * sin_b
    v32 = v.astype(jnp.float32)

    k_pool, v_pool = cache["k"], cache["v"]
    quant = "k_scale" in cache
    tail = "open_k" in cache
    open_k = cache.get("open_k")
    open_v = cache.get("open_v")
    page = k_pool.shape[3]
    rows = jnp.arange(b)

    def _patch_open_pages(k_layer, v_layer, final_lens):
        """XLA-oracle tail semantics: overwrite each row's LAST page in the
        dequantized layer with its exact bf16 open page (pages are
        row-exclusive, so the scatter is safe)."""
        last_pg = block_tables[rows, (final_lens - 1) // page]
        k_layer = k_layer.at[last_pg].set(
            jax.lax.dynamic_index_in_dim(open_k, li, 0, keepdims=False).astype(
                k_layer.dtype
            )
        )
        v_layer = v_layer.at[last_pg].set(
            jax.lax.dynamic_index_in_dim(open_v, li, 0, keepdims=False).astype(
                v_layer.dtype
            )
        )
        return k_layer, v_layer

    if s == 1:
        seq_lens = pos + 1
        page_ids = block_tables[rows, pos // page]
        off = pos % page
        if quant:
            kq, ks = quantize_kv(k32[:, :, 0, :])  # [B, Hh, D] / [B, Hh]
            vq, vs = quantize_kv(v32[:, :, 0, :])
            k_pool = _pool_write_rows(k_pool, kq, li, page_ids, off)
            v_pool = _pool_write_rows(v_pool, vq, li, page_ids, off)
            k_sc = _pool_write_rows_scale(cache["k_scale"], ks, li, page_ids, off)
            v_sc = _pool_write_rows_scale(cache["v_scale"], vs, li, page_ids, off)
            if tail:
                open_k = _pool_write_rows(open_k, k32[:, :, 0, :], li, rows, off)
                open_v = _pool_write_rows(open_v, v32[:, :, 0, :], li, rows, off)
        else:
            k_pool = _pool_write_rows(k_pool, k32[:, :, 0, :], li, page_ids, off)
            v_pool = _pool_write_rows(v_pool, v32[:, :, 0, :], li, page_ids, off)
        q_dec = q32[:, :, 0, :]  # [B, Hh, D]
        if quant and run_pallas:
            ctx = paged_decode_attention_pool_q8(
                q_dec, k_pool, v_pool, k_sc, v_sc, block_tables, seq_lens, li,
                scale=scale, open_k=open_k, open_v=open_v,
            )
        elif quant:
            k_layer = dequant_pages(
                jax.lax.dynamic_index_in_dim(k_pool, li, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(k_sc, li, 0, keepdims=False),
            )
            v_layer = dequant_pages(
                jax.lax.dynamic_index_in_dim(v_pool, li, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(v_sc, li, 0, keepdims=False),
            )
            if tail:
                k_layer, v_layer = _patch_open_pages(k_layer, v_layer, seq_lens)
            ctx = paged_decode_attention_xla(
                q_dec, k_layer, v_layer, block_tables, seq_lens, scale=scale
            )
        elif run_pallas:
            ctx = paged_decode_attention_pool(
                q_dec, k_pool, v_pool, block_tables, seq_lens, li, scale=scale
            )
        else:
            k_layer = jax.lax.dynamic_index_in_dim(k_pool, li, 0, keepdims=False)
            v_layer = jax.lax.dynamic_index_in_dim(v_pool, li, 0, keepdims=False)
            ctx = paged_decode_attention_xla(
                q_dec, k_layer, v_layer, block_tables, seq_lens, scale=scale
            )
        ctx = ctx.reshape(b, 1, h).astype(xn.dtype)
    else:
        posq = pos[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]  # [B, S]
        seq_lens = posq + 1  # per-query causal budgets
        page_ids = block_tables[rows[:, None], posq // page]  # [B, S]
        off = posq % page
        # [B, S] per-(row, step) DUS writes; values ordered [B, S, Hh, D].
        if quant:
            kq, ks = quantize_kv(k32.transpose(0, 2, 1, 3))  # [B,S,Hh,D]
            vq, vs = quantize_kv(v32.transpose(0, 2, 1, 3))
            k_pool = _pool_write_chunk(k_pool, kq, li, page_ids, off)
            v_pool = _pool_write_chunk(v_pool, vq, li, page_ids, off)
            k_sc = _pool_write_chunk_scale(cache["k_scale"], ks, li, page_ids, off)
            v_sc = _pool_write_chunk_scale(cache["v_scale"], vs, li, page_ids, off)
            if tail:
                # Blanket write at (row, pos % page): tokens that belong to
                # a PREVIOUS page land at offsets > the row's final offset
                # and are masked by the per-query budget at read time.
                rows_bs = jnp.broadcast_to(rows[:, None], off.shape)
                open_k = _pool_write_chunk(
                    open_k, k32.transpose(0, 2, 1, 3), li, rows_bs, off
                )
                open_v = _pool_write_chunk(
                    open_v, v32.transpose(0, 2, 1, 3), li, rows_bs, off
                )
        else:
            k_pool = _pool_write_chunk(
                k_pool, k32.transpose(0, 2, 1, 3), li, page_ids, off
            )
            v_pool = _pool_write_chunk(
                v_pool, v32.transpose(0, 2, 1, 3), li, page_ids, off
            )
        q_chunk = q32.transpose(0, 2, 1, 3)  # [B, S, Hh, D]
        if quant and run_pallas:
            ctx = paged_decode_attention_pool_chunk_q8(
                q_chunk, k_pool, v_pool, k_sc, v_sc, block_tables, seq_lens,
                li, scale=scale, open_k=open_k, open_v=open_v,
            )
        elif quant:
            k_layer = dequant_pages(
                jax.lax.dynamic_index_in_dim(k_pool, li, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(k_sc, li, 0, keepdims=False),
            )
            v_layer = dequant_pages(
                jax.lax.dynamic_index_in_dim(v_pool, li, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(v_sc, li, 0, keepdims=False),
            )
            if tail:
                k_layer, v_layer = _patch_open_pages(
                    k_layer, v_layer, seq_lens[:, -1]
                )
            ctx = paged_decode_attention_xla_chunk(
                q_chunk, k_layer, v_layer, block_tables, seq_lens, scale=scale
            )
        elif run_pallas:
            ctx = paged_decode_attention_pool_chunk(
                q_chunk, k_pool, v_pool, block_tables, seq_lens, li, scale=scale
            )
        else:
            k_layer = jax.lax.dynamic_index_in_dim(k_pool, li, 0, keepdims=False)
            v_layer = jax.lax.dynamic_index_in_dim(v_pool, li, 0, keepdims=False)
            ctx = paged_decode_attention_xla_chunk(
                q_chunk, k_layer, v_layer, block_tables, seq_lens, scale=scale
            )
        ctx = ctx.reshape(b, s, h).astype(xn.dtype)
    out_cache = {"k": k_pool, "v": v_pool}
    if quant:
        out_cache["k_scale"] = k_sc
        out_cache["v_scale"] = v_sc
    if tail:
        out_cache["open_k"] = open_k
        out_cache["open_v"] = open_v
    return _o_proj(ctx, attn, decode=True), out_cache


def _chunk_rope(cos, sin, pos: jnp.ndarray, s: int):
    """cos/sin broadcastable to [B, Hh, S, D] for per-row positions pos[B]
    (the chunk's S tokens sit at pos..pos+S-1 per row)."""
    if s == 1:
        cos_b = jnp.take(cos, pos, axis=0)[:, None, None, :]
        sin_b = jnp.take(sin, pos, axis=0)[:, None, None, :]
    else:
        posq = pos[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]  # [B, S]
        cos_b = jnp.take(cos, posq, axis=0)[:, None]  # [B, 1, S, D]
        sin_b = jnp.take(sin, posq, axis=0)[:, None]
    return cos_b, sin_b


def lm_decode_step_paged(
    params,
    cfg: DeepseekV2Config,
    embeds: jnp.ndarray,  # [B, S, H] (S==1 plain decode; S>1 lookup chunk)
    cache: PagedKV,
    block_tables: jnp.ndarray,  # [B, max_pages]
    pos: jnp.ndarray,  # [B] per-slot position of embeds[:, 0]
    *,
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, PagedKV]:
    """One decode step over the paged cache. Returns (hidden [B,S,H], cache).

    Quantized params (quantize_lm_params, either scope) take the unrolled
    int8 path automatically. S > 1 is the speculative-verification chunk
    mode (prompt-lookup decoding in the continuous engine).
    """
    if "moe_q8" in params:
        return _lm_decode_step_paged_q8(
            params, cfg, embeds, cache, block_tables, pos, use_pallas=use_pallas
        )
    cos, sin = _rope_consts(cfg)
    b, s, h = embeds.shape
    ld = cfg.first_k_dense_replace
    run_pallas = use_pallas and pallas_enabled()

    cos_b, sin_b = _chunk_rope(cos, sin, pos, s)
    from ..models.deepseek_v2 import _lift_experts_for_decode

    moe_layers, experts_stack = _lift_experts_for_decode(params["layers_moe"], b * s, cfg)

    def layer_step(x, layer, li, kv):
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        attn_out, kv = _paged_attention_step(
            xn, layer["attn"], cfg, kv, li, block_tables, pos,
            cos_b, sin_b, run_pallas,
        )
        x = res + attn_out

        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        x_flat = xn.reshape(b * s, h)
        if "router" in layer:
            weights, idx = route(x_flat, layer["router"], cfg.num_experts_per_tok)
            if experts_stack is not None:
                from ..ops.moe_decode import moe_ffn_decode_fused

                routed = moe_ffn_decode_fused(
                    x_flat, experts_stack, weights, idx, layer_idx=li - ld
                )
            else:
                routed = moe_ffn_decode(x_flat, layer["experts"], weights, idx)
            shared = swiglu(
                x_flat, layer["shared"]["gate"], layer["shared"]["up"], layer["shared"]["down"]
            )
            mlp_out = routed + shared
        else:
            mlp_out = swiglu(
                x_flat, layer["mlp"]["gate"], layer["mlp"]["up"], layer["mlp"]["down"]
            )
        x = res + mlp_out.reshape(b, s, h)
        return x, kv

    # Full pool carried in place (no per-layer slices, no stack/concat
    # re-assembly — at serving pool sizes the r1 xs/ys design re-copied the
    # whole multi-GB pool every step).
    x = embeds
    kv = dict(cache)
    for i in range(ld):
        layer = _index_tree(params["layers_dense"], i)
        x, kv = layer_step(x, layer, i, kv)

    def moe_body(carry, xs):
        x, kv = carry
        layer, li = xs
        x, kv = layer_step(x, layer, li, kv)
        return (x, kv), None

    moe_xs = (moe_layers, jnp.arange(ld, cfg.num_hidden_layers))
    (x, kv), _ = jax.lax.scan(moe_body, (x, kv), moe_xs)

    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return hidden, kv


def _lm_decode_step_paged_q8(
    params,
    cfg: DeepseekV2Config,
    embeds: jnp.ndarray,  # [B, S, H]
    cache: PagedKV,
    block_tables: jnp.ndarray,
    pos: jnp.ndarray,
    *,
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, PagedKV]:
    """Paged decode step for quantized params (unrolled: the fused int8
    kernels are opaque custom calls that must not be scan-sliced)."""
    cos, sin = _rope_consts(cfg)
    b, s, h = embeds.shape
    ld = cfg.first_k_dense_replace
    run_pallas = use_pallas and pallas_enabled()

    cos_b, sin_b = _chunk_rope(cos, sin, pos, s)

    def layer_step(x, layer, li, q8_experts, kv):
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        attn_out, kv = _paged_attention_step(
            xn, layer["attn"], cfg, kv, li, block_tables, pos,
            cos_b, sin_b, run_pallas,
        )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        ffn = _q8_ffn(
            xn.reshape(b * s, h), layer, cfg, q8_experts, decode=True, is_prefill=False
        )
        x = res + ffn.reshape(b, s, h)
        return x, kv

    x = embeds
    kv = dict(cache)
    for i in range(ld):
        layer = _q8_layer_weights(params, "dense", i)
        x, kv = layer_step(x, layer, i, None, kv)
    for j, q8 in enumerate(params["moe_q8"]):
        li = ld + j
        layer = _q8_layer_weights(params, "moe", j)
        x, kv = layer_step(x, layer, li, q8, kv)

    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return hidden, kv
