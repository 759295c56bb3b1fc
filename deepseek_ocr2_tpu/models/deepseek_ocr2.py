"""DeepSeek-OCR-2 composite model (vision + language) — functional JAX.

Capability-parity with /root/reference/src/model/deepseek_ocr2.rs:
- towers: SAM ViT-B -> Qwen2 compressor -> Linear projector 896->1280, plus a
  learnable `view_seperator` vector (deepseek_ocr2.rs:47-99);
- multimodal injection: `<image>` placeholder block replaced with vision
  tokens in HF order local(crops) -> global -> view_seperator — note this
  deliberately differs from the tokenizer's expansion order
  (deepseek_ocr2.rs:222-225);
- the LM trunk is flattened at the top level, matching HF key paths
  (`model.sam_model.*`, `model.layers.*`), deepseek_ocr2.rs:62-74.

Unlike the reference (batch=1 only, deepseek_ocr2.rs:140), the vision path is
batched: crops run as one SAM batch, and the serving engine batches pages.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import OCR2Config
from ..io.safetensors_io import LoadReport
from . import deepseek_v2 as dsv2
from . import qwen2 as qwen2_mod
from . import sam as sam_mod

Params = Dict[str, Any]


def normalize_pixels(x: jnp.ndarray, act_dtype) -> jnp.ndarray:
    """Cast image tensors to the activation dtype, normalizing raw uint8
    pixels on device first.

    Shipping uint8 and normalizing here is 4x fewer host->device bytes than
    shipping host-normalized f32 (the pixel transfer dominates admission on
    a tunneled/PCIe link) and is bit-identical: the f32 op sequence
    (u8 -> f32, /255, *2, -1) matches preprocess.image.images_to_nchw
    (reference normalize main.rs:1300-1326) element for element, and f32
    elementwise ops are IEEE-exact under XLA.
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / jnp.float32(255.0)
        x = x * jnp.float32(2.0) - jnp.float32(1.0)
    return x.astype(jnp.dtype(act_dtype))


def init_params(cfg: OCR2Config, key: jax.Array, lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = cfg.lm.hidden_size
    return {
        "lm": dsv2.init_params(cfg.lm, k1, dtype=lm_dtype),
        "sam": sam_mod.init_params(cfg.sam, k2, dtype=vision_dtype),
        "qwen2": qwen2_mod.init_params(cfg.qwen2, k3, dtype=vision_dtype),
        "projector": {
            "w": jax.random.normal(k4, (cfg.projector_in, h), vision_dtype) * 0.02,
            "b": jnp.zeros((h,), vision_dtype),
        },
        "view_seperator": jnp.zeros((h,), vision_dtype),
    }


def params_from_flat(
    flat: Dict[str, np.ndarray], cfg: OCR2Config
) -> Tuple[Params, LoadReport]:
    report = LoadReport()
    lm_params, r = dsv2.params_from_flat(flat, cfg.lm, prefix="model.")
    report.merge(r)
    sam_params, r = sam_mod.params_from_flat(flat, cfg.sam, prefix="model.sam_model.")
    report.merge(r)
    q_params, r = qwen2_mod.params_from_flat(flat, cfg.qwen2, prefix="model.qwen2_model.")
    report.merge(r)

    def take(name, transpose=False):
        arr = flat.get(name)
        if arr is None:
            report.missing.append(name)
            return None
        report.applied.append(name)
        return np.ascontiguousarray(arr.T) if transpose else arr

    params = {
        "lm": lm_params,
        "sam": sam_params,
        "qwen2": q_params,
        "projector": {
            "w": take("model.projector.layers.weight", transpose=True),
            "b": take("model.projector.layers.bias"),
        },
        "view_seperator": take("model.view_seperator"),
    }
    return params, report


def flat_from_params(params: Params, cfg: OCR2Config) -> Dict[str, np.ndarray]:
    """Full composite -> flat PyTorch-layout dict (checkpoint saving)."""
    flat: Dict[str, np.ndarray] = {}
    flat.update(dsv2.flat_from_params(params["lm"], cfg.lm, prefix="model."))
    flat.update(sam_mod.flat_from_params(params["sam"], cfg.sam))
    flat.update(qwen2_mod.flat_from_params(params["qwen2"], cfg.qwen2))
    flat["model.projector.layers.weight"] = np.ascontiguousarray(
        np.asarray(params["projector"]["w"]).T
    )
    flat["model.projector.layers.bias"] = np.asarray(params["projector"]["b"])
    flat["model.view_seperator"] = np.asarray(params["view_seperator"])
    return flat


def encode_views(
    params: Params,
    cfg: OCR2Config,
    image_base: jnp.ndarray,  # [1, 3, S, S] normalized to [-1, 1]
    patches: Optional[jnp.ndarray],  # [P, 3, c, c] or None
) -> jnp.ndarray:
    """Vision towers -> injected token rows [n_img, lm_hidden].

    Order: local(crops) -> global -> view_seperator
    (reference deepseek_ocr2.rs:222-234).
    """
    h = cfg.lm.hidden_size
    proj_w = params["projector"]["w"]
    proj_b = params["projector"]["b"]

    def tower(imgs):
        feats = sam_mod.sam_forward(params["sam"], cfg.sam, imgs)  # [B, C, h, w]
        feats = qwen2_mod.qwen2_encode(params["qwen2"], cfg.qwen2, feats)  # [B, nq, C]
        out = feats @ proj_w.astype(feats.dtype) + proj_b.astype(feats.dtype)
        return out  # [B, nq, lm_hidden]

    global_tokens = tower(image_base).reshape(-1, h)  # [nq_base, H]
    sep = params["view_seperator"].reshape(1, h)
    if patches is not None:
        local_tokens = tower(patches).reshape(-1, h)  # [P*nq_crop, H]
        return jnp.concatenate(
            [local_tokens, global_tokens, sep.astype(global_tokens.dtype)], axis=0
        )
    return jnp.concatenate([global_tokens, sep.astype(global_tokens.dtype)], axis=0)


def build_inputs_embeds(
    params: Params,
    cfg: OCR2Config,
    input_ids: jnp.ndarray,  # [1, S] i32
    vision_tokens: jnp.ndarray,  # [n_img, H]
    image_start: int,  # static: first placeholder index (contiguous block)
) -> jnp.ndarray:
    """Token embeddings with the placeholder block replaced by vision tokens.

    The tokenizer always expands `<image>` into one contiguous block, so this
    is the reference's slice_assign fast path (deepseek_ocr2.rs:261-271).
    """
    base = jnp.take(params["lm"]["embed"], input_ids, axis=0)  # [1, S, H]
    vis = vision_tokens.astype(base.dtype)[None]  # [1, n_img, H]
    return jax.lax.dynamic_update_slice(base, vis, (0, image_start, 0))


def build_inputs_embeds_masked(
    params: Params,
    cfg: OCR2Config,
    input_ids: jnp.ndarray,  # [1, S] i32
    vision_tokens: jnp.ndarray,  # [n_img, H] (all images' tokens, in order)
    image_mask: jnp.ndarray,  # [S] bool — True at placeholder positions
) -> jnp.ndarray:
    """Mask-driven injection: the n-th True position in `image_mask`
    receives `vision_tokens[n]`.

    Covers placeholder layouts that are NOT one contiguous block — multiple
    `<image>` spans or arbitrary masks (the reference's masked scatter-add
    fallback, deepseek_ocr2.rs:273-297; HF `masked_scatter` semantics). The
    single-block case should use `build_inputs_embeds` (dynamic_update_slice,
    no gather). TPU note: this is a row gather of [S] indices from
    [n_img, H] — row gathers are cheap; only weight-matrix gathers by traced
    index are pathological on this backend.
    """
    base = jnp.take(params["lm"]["embed"], input_ids, axis=0)  # [1, S, H]
    mask = image_mask.astype(bool)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1  # running placeholder rank
    pos = jnp.clip(pos, 0, vision_tokens.shape[0] - 1)
    vis = jnp.take(vision_tokens.astype(base.dtype), pos, axis=0)  # [S, H]
    return jnp.where(mask[None, :, None], vis[None], base)


def encode_views_multi(
    params: Params,
    cfg: OCR2Config,
    images: list,  # [(image_base [1,3,S,S], patches [P,3,c,c] | None), ...]
) -> jnp.ndarray:
    """Vision tokens for several images, concatenated in prompt order.

    Each image contributes its own local->global->separator block
    (reference deepseek_ocr2.rs:222-234 applied per image)."""
    return jnp.concatenate(
        [encode_views(params, cfg, base, patches) for base, patches in images],
        axis=0,
    )


def ocr_prefill_embeds(
    params: Params,
    cfg: OCR2Config,
    input_ids: jnp.ndarray,
    image_base: jnp.ndarray,
    patches: Optional[jnp.ndarray],
    image_start: int,
) -> jnp.ndarray:
    vision = encode_views(params, cfg, image_base, patches)
    return build_inputs_embeds(params, cfg, input_ids, vision, image_start)


def encode_views_batched(
    params: Params,
    cfg: OCR2Config,
    image_base: jnp.ndarray,  # [B, 3, S, S]
    patches: Optional[jnp.ndarray],  # [B, P, 3, c, c] or None (same P per page)
) -> jnp.ndarray:
    """Batched vision encode for multi-page serving. Returns [B, n_img, H].

    Pages in a batch share the crop grid (the engine groups by crop ratio),
    so crops flatten into one SAM batch of B*P tiles.
    """
    h = cfg.lm.hidden_size
    proj_w = params["projector"]["w"]
    proj_b = params["projector"]["b"]

    def tower(imgs):
        feats = sam_mod.sam_forward(params["sam"], cfg.sam, imgs)
        feats = qwen2_mod.qwen2_encode(params["qwen2"], cfg.qwen2, feats)
        return feats @ proj_w.astype(feats.dtype) + proj_b.astype(feats.dtype)

    b = image_base.shape[0]
    g = tower(image_base)  # [B, nq_base, H]
    sep = jnp.broadcast_to(
        params["view_seperator"].astype(g.dtype).reshape(1, 1, h), (b, 1, h)
    )
    if patches is not None:
        p = patches.shape[1]
        loc = tower(patches.reshape((b * p,) + patches.shape[2:]))  # [B*P, nq_c, H]
        loc = loc.reshape(b, p * loc.shape[1], h)
        return jnp.concatenate([loc, g, sep], axis=1)
    return jnp.concatenate([g, sep], axis=1)


def ocr_prefill_embeds_batched(
    params: Params,
    cfg: OCR2Config,
    input_ids: jnp.ndarray,  # [B, S]
    image_base: jnp.ndarray,  # [B, 3, S, S]
    patches: Optional[jnp.ndarray],  # [B, P, 3, c, c] or None
    image_start: int,
) -> jnp.ndarray:
    vision = encode_views_batched(params, cfg, image_base, patches)
    base = jnp.take(params["lm"]["embed"], input_ids, axis=0)  # [B, S, H]
    vis = vision.astype(base.dtype)
    return jax.lax.dynamic_update_slice(base, vis, (0, image_start, 0))
