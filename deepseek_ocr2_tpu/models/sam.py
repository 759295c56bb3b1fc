"""SAM ViT-B image encoder (DeepEncoderV2's ImageEncoderViT) — functional JAX.

Capability-parity with /root/reference/src/model/sam.rs, TPU-first:
- NHWC token layout throughout the transformer (reference sam.rs:116-120);
- window partition via reshape/transpose (reference sam.rs:193-259);
- decomposed relative-position attention bias (reference sam.rs:261-397);
- learned abs pos embed resized with bicubic+antialias for non-1024 inputs —
  `jax.image.resize` matches HF's `F.interpolate(mode='bicubic',
  antialias=True, align_corners=False)`, which the reference could only
  approximate with bilinear grid_sample (sam.rs:566-586);
- rel-pos tables resized with linear align_corners=False when needed
  (reference sam.rs:269-281);
- softmax + PV in f32 (reference sam.rs:399-402); GELU is exact (erf), the
  PyTorch default.

Output: [B, 896, S/64, S/64] feature maps (16x16 for 1024 inputs, 12x12 for
768 crops), reference sam.rs:554-603.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import SamConfig
from ..io.safetensors_io import FlatSource, LoadReport
from ..ops.flash_attention import mha_pallas, mha_win_pallas, pallas_enabled
from ..ops.norms import layer_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(cfg: SamConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    e, hd = cfg.embed_dim, cfg.head_dim
    side = cfg.tokens_per_side
    ks = jax.random.split(key, cfg.depth + 8)
    s = 0.02

    def rnd(k, *shape, scale=s):
        return jax.random.normal(k, shape, dtype) * scale

    blocks: List[Params] = []
    for i in range(cfg.depth):
        bsize = cfg.window_size if i not in cfg.global_attn_indexes else side
        bk = jax.random.split(ks[i], 8)
        blocks.append(
            {
                "ln1": {"w": jnp.ones((e,), dtype), "b": jnp.zeros((e,), dtype)},
                "ln2": {"w": jnp.ones((e,), dtype), "b": jnp.zeros((e,), dtype)},
                "attn": {
                    "qkv_w": rnd(bk[0], e, 3 * e),
                    "qkv_b": jnp.zeros((3 * e,), dtype),
                    "proj_w": rnd(bk[1], e, e),
                    "proj_b": jnp.zeros((e,), dtype),
                    "rel_h": rnd(bk[2], 2 * bsize - 1, hd),
                    "rel_w": rnd(bk[3], 2 * bsize - 1, hd),
                },
                "mlp": {
                    "w1": rnd(bk[4], e, int(e * cfg.mlp_ratio)),
                    "b1": jnp.zeros((int(e * cfg.mlp_ratio),), dtype),
                    "w2": rnd(bk[5], int(e * cfg.mlp_ratio), e),
                    "b2": jnp.zeros((e,), dtype),
                },
            }
        )
    oc = cfg.out_chans
    return {
        "patch_embed": {"w": rnd(ks[-1], e, 3, cfg.patch_size, cfg.patch_size), "b": jnp.zeros((e,), dtype)},
        "pos_embed": rnd(ks[-2], 1, side, side, e),
        "blocks": blocks,
        "neck": {
            "conv1": rnd(ks[-3], oc, e, 1, 1),
            "ln1": {"w": jnp.ones((oc,), dtype), "b": jnp.zeros((oc,), dtype)},
            "conv2": rnd(ks[-4], oc, oc, 3, 3),
            "ln2": {"w": jnp.ones((oc,), dtype), "b": jnp.zeros((oc,), dtype)},
        },
        "net_2": rnd(ks[-5], cfg.net_2_chans, oc, 3, 3),
        "net_3": rnd(ks[-6], cfg.net_3_chans, cfg.net_2_chans, 3, 3),
    }


def params_from_flat(
    flat: Dict[str, np.ndarray], cfg: SamConfig, prefix: str = "model.sam_model."
) -> Tuple[Params, LoadReport]:
    """HF key paths per reference sam.rs module tree (SamVitB)."""
    src = FlatSource(flat)
    t = src.take

    blocks = []
    for i in range(cfg.depth):
        bp = f"{prefix}blocks.{i}."
        blocks.append(
            {
                "ln1": {"w": t(bp + "norm1.weight"), "b": t(bp + "norm1.bias")},
                "ln2": {"w": t(bp + "norm2.weight"), "b": t(bp + "norm2.bias")},
                "attn": {
                    "qkv_w": t(bp + "attn.qkv.weight", transpose=True),
                    "qkv_b": t(bp + "attn.qkv.bias"),
                    "proj_w": t(bp + "attn.proj.weight", transpose=True),
                    "proj_b": t(bp + "attn.proj.bias"),
                    "rel_h": t(bp + "attn.rel_pos_h"),
                    "rel_w": t(bp + "attn.rel_pos_w"),
                },
                "mlp": {
                    "w1": t(bp + "mlp.lin1.weight", transpose=True),
                    "b1": t(bp + "mlp.lin1.bias"),
                    "w2": t(bp + "mlp.lin2.weight", transpose=True),
                    "b2": t(bp + "mlp.lin2.bias"),
                },
            }
        )
    params = {
        "patch_embed": {
            "w": t(prefix + "patch_embed.proj.weight"),
            "b": t(prefix + "patch_embed.proj.bias"),
        },
        "pos_embed": t(prefix + "pos_embed"),
        "blocks": blocks,
        "neck": {
            "conv1": t(prefix + "neck.0.weight"),
            "ln1": {"w": t(prefix + "neck.1.weight"), "b": t(prefix + "neck.1.bias")},
            "conv2": t(prefix + "neck.2.weight"),
            "ln2": {"w": t(prefix + "neck.3.weight"), "b": t(prefix + "neck.3.bias")},
        },
        "net_2": t(prefix + "net_2.weight"),
        "net_3": t(prefix + "net_3.weight"),
    }
    return params, src.report


def flat_from_params(params: Params, cfg: SamConfig, prefix: str = "model.sam_model.") -> Dict[str, np.ndarray]:
    """Inverse of params_from_flat (PyTorch layout) for checkpoint saving."""
    flat: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr)
        flat[name] = np.ascontiguousarray(a.T) if transpose else a

    put(prefix + "patch_embed.proj.weight", params["patch_embed"]["w"])
    put(prefix + "patch_embed.proj.bias", params["patch_embed"]["b"])
    put(prefix + "pos_embed", params["pos_embed"])
    for i, blk in enumerate(params["blocks"]):
        bp = f"{prefix}blocks.{i}."
        put(bp + "norm1.weight", blk["ln1"]["w"])
        put(bp + "norm1.bias", blk["ln1"]["b"])
        put(bp + "norm2.weight", blk["ln2"]["w"])
        put(bp + "norm2.bias", blk["ln2"]["b"])
        put(bp + "attn.qkv.weight", blk["attn"]["qkv_w"], transpose=True)
        put(bp + "attn.qkv.bias", blk["attn"]["qkv_b"])
        put(bp + "attn.proj.weight", blk["attn"]["proj_w"], transpose=True)
        put(bp + "attn.proj.bias", blk["attn"]["proj_b"])
        put(bp + "attn.rel_pos_h", blk["attn"]["rel_h"])
        put(bp + "attn.rel_pos_w", blk["attn"]["rel_w"])
        put(bp + "mlp.lin1.weight", blk["mlp"]["w1"], transpose=True)
        put(bp + "mlp.lin1.bias", blk["mlp"]["b1"])
        put(bp + "mlp.lin2.weight", blk["mlp"]["w2"], transpose=True)
        put(bp + "mlp.lin2.bias", blk["mlp"]["b2"])
    put(prefix + "neck.0.weight", params["neck"]["conv1"])
    put(prefix + "neck.1.weight", params["neck"]["ln1"]["w"])
    put(prefix + "neck.1.bias", params["neck"]["ln1"]["b"])
    put(prefix + "neck.2.weight", params["neck"]["conv2"])
    put(prefix + "neck.3.weight", params["neck"]["ln2"]["w"])
    put(prefix + "neck.3.bias", params["neck"]["ln2"]["b"])
    put(prefix + "net_2.weight", params["net_2"])
    put(prefix + "net_3.weight", params["net_3"])
    return flat


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _conv2d(x, w, b=None, stride=1, padding="VALID"):
    """NCHW conv with OIHW weights (PyTorch layout kept as-is)."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + b.astype(x.dtype).reshape(1, -1, 1, 1)
    return out


def _conv2d_nhwc(x, w, b=None, stride=1, padding="VALID"):
    """NHWC conv; weights stay in the checkpoint's OIHW layout (the HWIO
    flip is a tiny one-pass transpose vs re-laying-out the activations).
    TPU's native conv layout — keeps the channel axis on the lanes so the
    surrounding LayerNorms reduce over the minor dim."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype).transpose(2, 3, 1, 0),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _patch_embed(x, w, b, patch: int) -> jnp.ndarray:
    """[B, 3, S, S] NCHW pixels -> [B, S/p, S/p, E] NHWC patch tokens.

    A stride==kernel conv has no window overlap, so it IS a reshape +
    one GEMM (reference sam.rs:99-121 runs a real conv; here the MXU gets
    a single [B*h*w, p*p*3] x [p*p*3, E] matmul and the NCHW->NHWC flip
    rides the same data movement)."""
    b_, c, hh, ww = x.shape
    h, w_ = hh // patch, ww // patch
    xp = x.reshape(b_, c, h, patch, w_, patch).transpose(0, 2, 4, 3, 5, 1)
    xp = xp.reshape(b_, h, w_, patch * patch * c)
    wm = w.astype(x.dtype).transpose(2, 3, 1, 0).reshape(patch * patch * c, -1)
    return xp @ wm + b.astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def window_partition(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B,H,W,C] -> [B*nW, win, win, C] with zero padding (sam.rs:193-222)."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    hp, wp = pad_hw
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // ((hp // window) * (wp // window))
    x = windows.reshape(b, hp // window, wp // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return x[:, :h, :w, :]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Relative-position table lookup with linear resize (sam.rs:261-303).

    Returns [q_size, k_size, head_dim] in f32. Resize matches PyTorch
    `F.interpolate(mode='linear', align_corners=False)`.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    rel = rel_pos.astype(jnp.float32)
    if rel.shape[0] != max_rel_dist:
        rel = jax.image.resize(
            rel, (max_rel_dist, rel.shape[1]), method="linear", antialias=False
        )
    assert q_size == k_size, "q/k rel_pos scaling not needed for OCR2 configs"
    offset = k_size - 1
    idx = np.arange(q_size)[:, None] - np.arange(k_size)[None, :] + offset
    return rel[idx.reshape(-1)].reshape(q_size, k_size, rel.shape[1])


_PAD_NEG = -1.0e30  # key-padding mask for padded window tokens (exp -> exactly 0)


def _attention(
    x: jnp.ndarray, attn: Params, num_heads: int, valid_hw: Tuple[int, int] = None
) -> jnp.ndarray:
    """Decomposed rel-pos attention on [B, H, W, C] (sam.rs:345-411).

    valid_hw=(vh, vw): x is a window spatially zero-padded from (vh, vw) to
    (H, W) so that H*W meets the fused kernel's lane constraints (e.g. the
    14x14=196-token SAM windows padded to 16x16=256). Padded positions are
    excluded as keys by folding -1e30 into the decomposed rel bias (the one
    term that already varies per key); padded query rows produce well-defined
    garbage the caller slices off.
    """
    b, h, w, dim = x.shape
    hd = dim // num_heads
    l = h * w
    qkv = (x @ attn["qkv_w"].astype(x.dtype) + attn["qkv_b"].astype(x.dtype)).reshape(
        b, l, 3, num_heads, hd
    )
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # [B, heads, L, hd]
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)

    scale_ = 1.0 / math.sqrt(hd)
    if (
        pallas_enabled()
        and os.environ.get("DEEPSEEK_SAM_WIN_KERNEL", "") == "1"
        and valid_hw is not None
        and h == w
        and l % 128 == 0
        and l >= 256
    ):
        # Padded-window fast path: the rel bias is computed INSIDE the
        # kernel from the flattened tables (see _attn_kernel_relwin) —
        # no q32 cast, no batched einsums, no [B*H, L, win] bias tensors
        # through HBM, and the key-pad mask is a static in-kernel term.
        vh, vw = valid_hw
        assert vh == vw, "SAM windows are square"
        rh = get_rel_pos(vh, vh, attn["rel_h"])  # [vh, vh, hd] f32
        rw = get_rel_pos(vw, vw, attn["rel_w"])
        rhf = (
            jnp.pad(rh, ((0, h - vh), (0, h - vh), (0, 0)))
            .transpose(2, 0, 1)
            .reshape(hd, l)
        )
        rwf = (
            jnp.pad(rw, ((0, w - vw), (0, w - vw), (0, 0)))
            .transpose(2, 0, 1)
            .reshape(hd, l)
        )
        ctx = mha_win_pallas(
            q, k, v, rhf, rwf, scale=scale_, win=h, valid=vh, out_dtype=x.dtype
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, h, w, dim)
        return ctx @ attn["proj_w"].astype(x.dtype) + attn["proj_b"].astype(x.dtype)

    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)

    # Decomposed relative-position bias (from unscaled q, sam.rs:374-391).
    vh, vw = valid_hw if valid_hw is not None else (h, w)
    rh = get_rel_pos(vh, vh, attn["rel_h"])  # [vh, vh, hd] f32
    rw = get_rel_pos(vw, vw, attn["rel_w"])  # [vw, vw, hd] f32
    if (vh, vw) != (h, w):
        rh = jnp.pad(rh, ((0, h - vh), (0, h - vh), (0, 0)))
        rw = jnp.pad(rw, ((0, w - vw), (0, w - vw), (0, 0)))
    r_q = q32.reshape(b * num_heads, h, w, hd)
    rel_h = jnp.einsum("nhwc,hkc->nhwk", r_q, rh)  # [B*heads, H, W, Hk]
    rel_w = jnp.einsum("nhwc,wkc->nhwk", r_q, rw)  # [B*heads, H, W, Wk]
    if (vh, vw) != (h, w):
        rel_h = jnp.where(jnp.arange(h) >= vh, jnp.float32(_PAD_NEG), rel_h)
        rel_w = jnp.where(jnp.arange(w) >= vw, jnp.float32(_PAD_NEG), rel_w)

    scale = 1.0 / math.sqrt(hd)
    if pallas_enabled() and l % 128 == 0 and l >= 256:
        # Fused-bias Pallas kernel: never materializes the [L, L] bias/scores
        # in HBM (the XLA path below is HBM-bound at L=4096). q/k/v pass in
        # the model dtype: the values are bf16-born (no RoPE upcast in SAM),
        # so the kernel's f32-accumulated native dot is bit-identical to the
        # f32 path while halving DMA and taking one MXU pass instead of the
        # f32 three-pass form.
        ctx = mha_pallas(
            q,
            k,
            v,
            scale=scale,
            rel_h=rel_h.reshape(b, num_heads, l, h),
            rel_w=rel_w.reshape(b, num_heads, l, w),
            out_dtype=x.dtype,
        )
    else:
        bias = rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        bias = bias.reshape(b, num_heads, l, l)
        scores = (
            jnp.einsum("bnqd,bnkd->bnqk", q32, k32, preferred_element_type=jnp.float32)
            * scale
            + bias
        )
        weights = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bnqk,bnkd->bnqd", weights, v32).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, h, w, dim)
    return ctx @ attn["proj_w"].astype(x.dtype) + attn["proj_b"].astype(x.dtype)


def _window_pad_target(window: int) -> int:
    """Smallest padded side t (window <= t <= window+2) whose t*t token count
    meets the fused kernel's constraints (multiple of 128, >= 256); 0 if none
    cheap enough. 14 -> 16 (196 -> 256 tokens, +31% FLOPs for a fused-VMEM
    attention instead of the HBM-bound XLA path)."""
    for t in range(window, window + 3):
        if t * t % 128 == 0 and t * t >= 256:
            return t
    return 0


def _block(x: jnp.ndarray, blk: Params, cfg: SamConfig, window: int) -> jnp.ndarray:
    shortcut = x
    x = layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], cfg.layer_norm_eps)
    if window > 0:
        _, h, w, _ = x.shape
        wins, pad_hw = window_partition(x, window)
        t = _window_pad_target(window)
        if t > window and pallas_enabled():
            pad = t - window
            wins = jnp.pad(wins, ((0, 0), (0, pad), (0, pad), (0, 0)))
            wins = _attention(wins, blk["attn"], cfg.num_heads, valid_hw=(window, window))
            wins = wins[:, :window, :window, :]
        else:
            wins = _attention(wins, blk["attn"], cfg.num_heads)
        x = window_unpartition(wins, window, pad_hw, (h, w))
    else:
        x = _attention(x, blk["attn"], cfg.num_heads)
    x = shortcut + x
    xn = layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], cfg.layer_norm_eps)
    m = blk["mlp"]
    bb, hh, ww, cc = xn.shape
    ff = m["w1"].shape[1]
    if pallas_enabled() and cc % 128 == 0 and ff % 128 == 0:
        # Fused M-tiled MLP: VMEM-resident weights, no HBM round-trip for
        # the [M, 4E] intermediate, erf overlapped with the dots
        # (ops/fused_mlp.py; same rounding points as the XLA form below).
        from ..ops.fused_mlp import mlp_gelu

        mlp = mlp_gelu(
            xn.reshape(bb * hh * ww, cc), m["w1"], m["b1"], m["w2"], m["b2"]
        ).reshape(bb, hh, ww, cc)
    else:
        mlp = (
            _gelu(xn @ m["w1"].astype(x.dtype) + m["b1"].astype(x.dtype))
            @ m["w2"].astype(x.dtype)
            + m["b2"].astype(x.dtype)
        )
    return x + mlp


def resize_pos_embed(pos: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[1, ph, pw, C] -> [1, h, w, C], bicubic + antialias, f32 inner.

    Matches HF `F.interpolate(mode='bicubic', antialias=True,
    align_corners=False)` (see reference sam.rs:566-573 for the HF contract).

    DEEPSEEK_SAM_POS_RESIZE ablation toggle (reference sam.rs:575-586): the
    reference cannot express bicubic+antialias, so it defaults to bilinear
    align_corners=false and offers interp_* overrides. Here the HF behavior
    IS the default; the env var selects the reference's approximations for
    numeric-diff debugging:
      interp_bilinear -> bilinear, no antialias (reference default)
      interp_bicubic  -> bicubic, no antialias
    """
    _, ph, pw, c = pos.shape
    if (ph, pw) == (h, w):
        return pos
    mode = os.environ.get("DEEPSEEK_SAM_POS_RESIZE", "")
    if mode == "interp_bilinear":
        method, antialias = "bilinear", False
    elif mode == "interp_bicubic":
        method, antialias = "bicubic", False
    else:
        method, antialias = "bicubic", True
    out = jax.image.resize(
        pos.astype(jnp.float32), (1, h, w, c), method=method, antialias=antialias
    )
    return out.astype(pos.dtype)


def sam_forward(params: Params, cfg: SamConfig, x: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, S, S] image -> [B, net_3_chans, S/64, S/64] features."""
    x = _patch_embed(
        x, params["patch_embed"]["w"], params["patch_embed"]["b"], cfg.patch_size
    )
    _, h, w, _ = x.shape
    x = x + resize_pos_embed(params["pos_embed"], h, w).astype(x.dtype)

    for i, blk in enumerate(params["blocks"]):
        window = 0 if i in cfg.global_attn_indexes else cfg.window_size
        x = _block(x, blk, cfg, window)

    # Neck + downsample stay NHWC end-to-end (channel LayerNorm == last-axis
    # LayerNorm there — same biased-variance math as layer_norm_2d); one
    # NCHW flip on the tiny [B, C, S/64, S/64] output instead of per-op
    # relayouts (reference sam.rs:510-540 is NCHW throughout).
    neck = params["neck"]
    x = x @ neck["conv1"][:, :, 0, 0].T.astype(x.dtype)  # 1x1 conv == matmul
    x = layer_norm(x, neck["ln1"]["w"], neck["ln1"]["b"], cfg.layer_norm_eps)
    x = _conv2d_nhwc(x, neck["conv2"], padding=((1, 1), (1, 1)))
    x = layer_norm(x, neck["ln2"]["w"], neck["ln2"]["b"], cfg.layer_norm_eps)
    x = _conv2d_nhwc(x, params["net_2"], stride=2, padding=((1, 1), (1, 1)))
    x = _conv2d_nhwc(x, params["net_3"], stride=2, padding=((1, 1), (1, 1)))
    return x.transpose(0, 3, 1, 2)
