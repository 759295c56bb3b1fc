"""Pallas attention kernels (TPU).

Q-blocked attention with VMEM-resident K/V: for the sequence lengths this
model sees (SAM global 4096, Qwen2 512, LM prefill <=2048), one head's K/V
fits comfortably in VMEM (<=1 MB bf16), so each q-tile computes its full
score row in one shot — exact softmax, no running-max bookkeeping — and the
[L, L] matrix never touches HBM. That materialization is what makes the XLA
path HBM-bound (measured 10.8 ms per SAM global block; this kernel brings a
q-tile's traffic down to K/V once per head).

Supported score modifiers (all static at trace time):
- mode="none" | "causal" | "prefix" (prefix-LM, reference qwen2.rs:45-72)
- decomposed relative-position bias (SAM, reference sam.rs:374-397):
  bias[q, (kh, kw)] = rel_h[q, kh] + rel_w[q, kw], folded into the score
  tile on the fly — the [L, L] bias is never built.

Numeric parity: scores f32, masked positions -1e4 (matching the reference's
mask constant), key padding excluded with -inf, softmax f32, PV f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1.0e4


def _dg(a, b, dims, precision=None):
    """dot_general with precision picked by dtype (cf. moe_gmm._dot): bf16
    operands pin DEFAULT — a global 'highest' (the CPU parity conftest)
    would lower them to multi-pass Mosaic forms this backend rejects. f32
    operands inherit the global setting, so interpret-mode kernels match
    the XLA paths bit for bit on CPU while the TPU runtime keeps its fast
    single-pass dots. Pass `precision` to pin explicitly (f32 dots whose
    values must survive untruncated — without it, production runs with no
    global override lower f32 dots to bf16 multiplies)."""
    if precision is None:
        precision = (
            None
            if a.dtype == jnp.float32 and b.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=precision
    )


def _attn_kernel(
    q_ref,  # [NB, TQ, D]
    k_ref,  # [NB, Lk, D]
    v_ref,  # [NB, Lk, D]
    o_ref,  # [NB, TQ, D]
    *,
    scale: float,
    mode: str,
    n_prefix: int,
    seq_k: int,
    block_q: int,
    nb: int,
):
    qi = pl.program_id(1)
    for i in range(nb):
        # Score dot in the native dtype (bf16 inputs take one MXU pass; the
        # f32 accumulate makes it exact for bf16-valued operands).
        q = q_ref[i]  # [TQ, D]
        k = k_ref[i]  # [Lk, D]
        v = v_ref[i].astype(jnp.float32)

        scores = _dg(q, k, (((1,), (1,)), ((), ()))) * jnp.float32(scale)  # [TQ, Lk]

        tq, lk = scores.shape
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (tq, lk), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, lk), 1)

        if mode == "causal":
            disallow = k_pos > q_pos
            scores = jnp.where(disallow, jnp.float32(MASK_VALUE), scores)
        elif mode == "prefix":
            prefix_row = q_pos < n_prefix
            query_col = k_pos >= n_prefix
            future = k_pos > q_pos
            disallow = (prefix_row & query_col) | (
                (q_pos >= n_prefix) & query_col & future
            )
            scores = jnp.where(disallow, jnp.float32(MASK_VALUE), scores)

        if seq_k < lk:  # exclude key padding entirely
            scores = jnp.where(k_pos >= seq_k, jnp.float32(-jnp.inf), scores)

        weights = jax.nn.softmax(scores, axis=-1)
        out = _dg(weights, v, (((1,), (0,)), ((), ())))
        o_ref[i] = out.astype(o_ref.dtype)


def _attn_kernel_relpos(
    q_ref, k_ref, v_ref, relh_ref, relw_ref, o_ref, *, scale, seq_k, block_q, k_w, nb
):
    """Attention with decomposed rel-pos bias; Lk == Kh * k_w.

    NB (window, head) problems per grid step: the SAM windowed case has
    ~1200 tiny independent attentions, and one-per-step leaves the MXU idle
    on per-step overhead (measured ~6 us/step vs ~2 us of work)."""
    tq = q_ref.shape[1]
    lk = k_ref.shape[1]
    k_h = lk // k_w
    # bias[q, kh*Kw + kw] = rel_h[q, kh] + rel_w[q, kw]. The rel_w half is a
    # pure lane-tile of the [TQ, Kw] block (column j wants rel_w[:, j % Kw]),
    # which pltpu.repeat produces on the VPU in exact f32. The rel_h half
    # (element-repeat along lanes) has no cheap Mosaic form — a broadcast +
    # [TQ, Kh, Kw] shape-cast fails infer-vector-layout — so it expands via a
    # 0/1-select matrix on the MXU. Measured at the SAM global shape
    # (Kh=Kw=64, Lk=4096): both-dots 5.6 ms/block, tile+dot 4.4 ms.
    kpos_h = jax.lax.broadcasted_iota(jnp.int32, (k_h, lk), 1) // k_w
    eh = (kpos_h == jax.lax.broadcasted_iota(jnp.int32, (k_h, lk), 0)).astype(
        jnp.float32
    )  # [Kh, Lk]

    for i in range(nb):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i].astype(jnp.float32)
        rel_h = relh_ref[i].astype(jnp.float32)  # [TQ, Kh]
        rel_w = relw_ref[i].astype(jnp.float32)  # [TQ, Kw]

        scores = _dg(q, k, (((1,), (1,)), ((), ()))) * jnp.float32(scale)

        bias = _dg(rel_h, eh, (((1,), (0,)), ((), ()))) + pltpu.repeat(
            rel_w, k_h, axis=1
        )
        scores = scores + bias

        if seq_k < lk:
            k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, lk), 1)
            scores = jnp.where(k_pos >= seq_k, jnp.float32(-jnp.inf), scores)

        weights = jax.nn.softmax(scores, axis=-1)
        out = _dg(weights, v, (((1,), (0,)), ((), ())))
        o_ref[i] = out.astype(o_ref.dtype)


def _attn_kernel_relwin(
    q_ref,  # [NB, T2, D] padded window tokens (win*win)
    k_ref,  # [NB, T2, D]
    v_ref,  # [NB, T2, D]
    rhf_ref,  # [D, T2] f32: rhf[c, h*win + kh] = rel_h_table[h, kh, c]
    rwf_ref,  # [D, T2] f32: rwf[c, w*win + kw] = rel_w_table[w, kw, c]
    o_ref,  # [NB, T2, D]
    *,
    scale: float,
    win: int,
    valid: int,
    nb: int,
):
    """Windowed SAM attention with the decomposed rel-pos bias computed
    entirely in VMEM (sam.rs:345-411 semantics).

    The outside-XLA form (q32 cast -> two batched einsums -> where-masks ->
    [B*H, T2, win] HBM tensors streamed back in) costs ~1.7 ms per SAM
    windowed block in glue and traffic. Here the whole bias comes from four
    MXU dots on tiles that already live in VMEM:

      rel_all_h[q, h*win+kh] = q32[q] . rel_h_table[h, kh]   (q @ rhf)
      bias_h[q, kk] = rel_all_h[q, h(q)*win + kh(kk)]
                    = ((rel_all_h * rowmask_h) @ EH)[q, kk]

    where rowmask_h selects each query row's own h-group and EH is the
    static 0/1 matrix EH[j, kk] = (j % win == kk // win); rel_w is the same
    with w(q) = q % win and EW[j, kk] = (j % win == kk % win). The masked
    select dots move exactly one f32 value per output (exact under any
    precision that preserves copies; under the tests' global 'highest' they
    are bit-exact). Window padding (win > valid, e.g. SAM's 14->16) is a
    static key mask: padded keys get -1e30 before the softmax, so their
    weights underflow to exactly 0 and padded-query rows produce garbage the
    caller slices off — same contract as the streamed-bias path.
    """
    t2 = q_ref.shape[1]
    qi = jax.lax.broadcasted_iota(jnp.int32, (t2, t2), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (t2, t2), 1)
    mask_h = (ji // win == qi // win).astype(jnp.float32)
    mask_w = (ji // win == qi % win).astype(jnp.float32)
    eh = (qi % win == ji // win).astype(jnp.float32)  # EH[j, kk]
    ew = (qi % win == ji % win).astype(jnp.float32)  # EW[j, kk]
    if valid < win:
        key_pad = jnp.where(
            (ji // win >= valid) | (ji % win >= valid),
            jnp.float32(-1.0e30),
            jnp.float32(0.0),
        )
    else:
        key_pad = None
    rhf = rhf_ref[...]
    rwf = rwf_ref[...]

    for i in range(nb):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i].astype(jnp.float32)
        q32 = q.astype(jnp.float32)

        scores = _dg(q, k, (((1,), (1,)), ((), ()))) * jnp.float32(scale)

        # f32 HIGHEST pinned: the select dots must move the f32 bias values
        # untruncated (default precision would bf16-round them on TPU), and
        # the rel_all dot feeds them.
        hi = jax.lax.Precision.HIGHEST
        rel_all_h = _dg(q32, rhf, (((1,), (0,)), ((), ())), precision=hi)  # [T2, T2]
        bias_h = _dg(rel_all_h * mask_h, eh, (((1,), (0,)), ((), ())), precision=hi)
        rel_all_w = _dg(q32, rwf, (((1,), (0,)), ((), ())), precision=hi)
        bias_w = _dg(rel_all_w * mask_w, ew, (((1,), (0,)), ((), ())), precision=hi)
        scores = scores + bias_h + bias_w
        if key_pad is not None:
            scores = scores + key_pad

        weights = jax.nn.softmax(scores, axis=-1)
        out = _dg(weights, v, (((1,), (0,)), ((), ())))
        o_ref[i] = out.astype(o_ref.dtype)


def mha_win_pallas(
    q: jnp.ndarray,  # [B, H, T2, D], T2 = win*win
    k: jnp.ndarray,
    v: jnp.ndarray,
    rhf: jnp.ndarray,  # [D, T2] f32 flattened rel_h table (see kernel)
    rwf: jnp.ndarray,  # [D, T2] f32
    *,
    scale: float,
    win: int,
    valid: int,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed rel-pos attention with the bias built in VMEM from the raw
    rel tables. One window = one problem; NB problems batch per grid step
    (the SAM windowed case has ~1200 tiny independent attentions)."""
    b, h, t2, d = q.shape
    assert t2 == win * win and k.shape[2] == t2
    assert t2 % 128 == 0, "windowed kernel requires win*win % 128 == 0"
    out_dtype = out_dtype or q.dtype
    bh = b * h

    nb = 1
    for cand in (16, 8, 4, 2):
        # ~3 simultaneously-live f32 [T2, T2] tiles per problem (scores +
        # rel_all + bias; Mosaic reuses the rest across the unrolled loop),
        # plus ~1.4 MB of shared static masks outside the loop.
        if bh % cand == 0 and cand * t2 * t2 * 4 * 3 < 8 * 1024 * 1024:
            nb = cand
            break

    grid = (bh // nb,)
    qkv_spec = pl.BlockSpec((nb, t2, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((d, t2), lambda bi: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _attn_kernel_relwin, scale=scale, win=win, valid=valid, nb=nb
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, tab_spec, tab_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t2, d), out_dtype),
        interpret=interpret,
    )(
        q.reshape(bh, t2, d),
        k.reshape(bh, t2, d),
        v.reshape(bh, t2, d),
        rhf.astype(jnp.float32),
        rwf.astype(jnp.float32),
    )
    return out.reshape(b, h, t2, d)


def _pad_axis(x, axis, to):
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def mha_pallas(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,
    *,
    scale: float,
    mode: str = "none",
    n_prefix: int = 0,
    rel_h: Optional[jnp.ndarray] = None,  # [B, H, Lq, Kh]
    rel_w: Optional[jnp.ndarray] = None,  # [B, H, Lq, Kw]
    block_q: int = 256,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Q-blocked exact attention. Returns [B, H, Lq, D] in out_dtype."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    out_dtype = out_dtype or q.dtype
    assert mode in ("none", "causal", "prefix")
    use_rel = rel_h is not None
    if use_rel:
        assert mode == "none"

    bh = b * h
    # VMEM budget: K/V blocks stay bf16 (2 * lk * d * 2) and the big tiles
    # are the f32 score/bias/weight rows (block_q * lk * 4 each) plus the
    # rel-pos select matrix ((lk/kw) * lk * 4). The rel path fits block_q=256
    # at L=4096 (~14.6 MB) and is measurably faster there than 128 (fewer
    # per-step iota/eh builds, bigger MXU M): 4.4 vs 5.7 ms per SAM global
    # block. The plain path keeps the older conservative split (its f32
    # variants were measured to OOM at 256 with L=4096).
    if use_rel:
        eh_bytes = (lk // rel_w.shape[-1]) * _round_up(lk, 128) * 4
        if 2 * lk * d * 2 + 3 * block_q * lk * 4 + eh_bytes > 15 * 1024 * 1024:
            block_q = 128
    elif lk * 4 * (2 * d + 3 * block_q) > 12 * 1024 * 1024:
        block_q = 128
    block_q = min(block_q, _round_up(lq, 128))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, 128)

    # Many-tiny-attentions regime (SAM windows: bh ~ 1200, L=256): batch NB
    # independent problems per grid step so the per-step overhead amortizes.
    # Bound the per-step score/weight tiles (~nb * block_q * lk f32) to keep
    # the VMEM budget; only worthwhile when the whole problem is one q-block.
    nb = 1
    if lq_pad == block_q and lk_pad <= 512:
        for cand in (16, 8, 4, 2):
            if bh % cand == 0 and cand * lk_pad * 4 * (2 * d + 3 * block_q) < 10 * 1024 * 1024:
                nb = cand
                break

    qf = _pad_axis(q.reshape(bh, lq, d), 1, lq_pad)
    kf = _pad_axis(k.reshape(bh, lk, d), 1, lk_pad)
    vf = _pad_axis(v.reshape(bh, lk, d), 1, lk_pad)

    grid = (bh // nb, lq_pad // block_q)
    q_spec = pl.BlockSpec((nb, block_q, d), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((nb, lk_pad, d), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((nb, block_q, d), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)

    if use_rel:
        kh = rel_h.shape[-1]
        kw = rel_w.shape[-1]
        assert kh * kw == lk, (kh, kw, lk)
        assert lk == lk_pad, "rel-pos path requires Lk multiple of 128"
        rh = _pad_axis(rel_h.reshape(bh, lq, kh), 1, lq_pad)
        rw = _pad_axis(rel_w.reshape(bh, lq, kw), 1, lq_pad)
        rh_spec = pl.BlockSpec((nb, block_q, kh), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)
        rw_spec = pl.BlockSpec((nb, block_q, kw), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _attn_kernel_relpos, scale=scale, seq_k=lk, block_q=block_q, k_w=kw, nb=nb
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, rh_spec, rw_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), out_dtype),
            interpret=interpret,
        )(qf, kf, vf, rh, rw)
    else:
        kernel = functools.partial(
            _attn_kernel,
            scale=scale,
            mode=mode,
            n_prefix=n_prefix,
            seq_k=lk,
            block_q=block_q,
            nb=nb,
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), out_dtype),
            interpret=interpret,
        )(qf, kf, vf)

    return out[:, :lq].reshape(b, h, lq, d)


def pallas_enabled() -> bool:
    """Kernels run compiled on TPU only; other backends use the XLA paths."""
    import os

    if os.environ.get("DEEPSEEK_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
