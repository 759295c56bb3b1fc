"""Training step for the DeepSeek-V2 backbone.

The reference is inference-only; this exists so the TPU stack is complete for
fine-tuning and to exercise the dp/tp/ep shardings end-to-end (gradients flow
through the same lax.scan layer stack, MoE dispatch, and attention as
inference).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import DeepseekV2Config
from ..models.deepseek_v2 import lm_forward, logits_all, no_prefill_lift
from .kv_cache import make_kv_cache


def lm_loss(
    params, cfg: DeepseekV2Config, ids: jnp.ndarray, remat: bool = False
) -> jnp.ndarray:
    """Next-token cross-entropy over [B, S] token ids (f32 loss math)."""
    b, s = ids.shape
    embeds = jnp.take(params["embed"], ids, axis=0)
    cache = make_kv_cache(
        cfg.num_hidden_layers,
        b,
        cfg.num_attention_heads,
        s,
        cfg.head_dim,
        dtype=embeds.dtype,
    )
    hidden, _ = lm_forward(
        params, cfg, embeds, cache, pos=0, is_prefill=True, remat=remat
    )
    logits = logits_all(params, hidden).astype(jnp.float32)  # [B, S, V]
    targets = ids[:, 1:]
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], targets
    )
    return jnp.mean(loss)


def lm_loss_masked(
    params,
    cfg: DeepseekV2Config,
    ids: jnp.ndarray,
    loss_mask: jnp.ndarray,
    remat: bool = False,
) -> jnp.ndarray:
    """Next-token CE restricted to positions where loss_mask is 1 (SFT:
    train on the completion, not the prompt or padding)."""
    b, s = ids.shape
    embeds = jnp.take(params["embed"], ids, axis=0)
    cache = make_kv_cache(
        cfg.num_hidden_layers,
        b,
        cfg.num_attention_heads,
        s,
        cfg.head_dim,
        dtype=embeds.dtype,
    )
    hidden, _ = lm_forward(
        params, cfg, embeds, cache, pos=0, is_prefill=True, remat=remat
    )
    logits = logits_all(params, hidden).astype(jnp.float32)
    m = loss_mask[:, 1:].astype(jnp.float32)
    targets = jnp.where(m > 0, ids[:, 1:], 0)  # pad ids may be out-of-vocab
    per_tok = optax.softmax_cross_entropy_with_integer_labels(logits[:, :-1], targets)
    return jnp.sum(per_tok * m) / jnp.maximum(jnp.sum(m), 1.0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "tx", "remat"), donate_argnums=(0, 1)
)
def adamw_sft_train_step(
    params, opt_state, cfg: DeepseekV2Config, ids: jnp.ndarray, loss_mask, tx,
    remat: bool = False,
):
    """One AdamW step on (prompt, completion) pairs with masked loss."""
    with no_prefill_lift():
        loss, grads = jax.value_and_grad(lm_loss_masked)(
            params, cfg, ids, loss_mask, remat
        )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def sgd_train_step(
    params, cfg: DeepseekV2Config, ids: jnp.ndarray, lr: float = 1e-4
) -> Tuple[dict, jnp.ndarray]:
    """One SGD step; returns (new_params, loss)."""
    with no_prefill_lift():  # backward must see unstacked experts (scan xs)
        loss, grads = jax.value_and_grad(lm_loss)(params, cfg, ids)
    new_params = jax.tree_util.tree_map(
        lambda p, g: (p.astype(jnp.float32) - lr * g.astype(jnp.float32)).astype(p.dtype),
        params,
        grads,
    )
    return new_params, loss


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.95,
    clip_norm: float = 1.0,
    grad_accum: int = 1,
    schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 0,
):
    """AdamW with global-norm clipping (the fine-tuning default).

    grad_accum > 1 wraps in optax.MultiSteps: each train step contributes
    one micro-batch gradient; params update every grad_accum-th step with
    the averaged gradient (equivalent to a grad_accum-times-larger batch).
    schedule: "constant" (optional linear warmup) or "cosine" (warmup ->
    peak lr -> cosine decay to lr/10 over total_steps TRAIN steps —
    converted to optimizer updates internally, since MultiSteps advances
    the schedule only once per accumulated update).
    """
    if grad_accum > 1:
        warmup_steps = -(-warmup_steps // grad_accum) if warmup_steps else 0
        total_steps = -(-total_steps // grad_accum) if total_steps else 0
    if schedule == "cosine":
        assert total_steps > 0, "cosine schedule needs total_steps"
        lr_s = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else lr,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=lr * 0.1,
        )
    elif warmup_steps:
        lr_s = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        lr_s = lr
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr_s, b1=b1, b2=b2, weight_decay=weight_decay),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def init_opt_state(tx, params):
    """Initialize optimizer state under jit: moment tensors inherit the
    parameters' shardings, so on a mesh the state is sharded exactly like
    the params (TP/EP rows never gather to one device)."""
    return jax.jit(tx.init)(params)


def ocr_loss(
    params,  # composite tree: {"lm", "sam", "qwen2", "projector", "view_seperator"}
    cfg,  # OCR2Config
    ids: jnp.ndarray,  # [B, S] with the placeholder block at image_start
    image_base: jnp.ndarray,  # [B, 3, S_img, S_img]: [-1,1] floats or raw uint8
    patches,  # [B, P, 3, c, c] or None
    image_start: int,
    loss_mask: jnp.ndarray,  # [B, S] 1.0 where the token is a training target
) -> jnp.ndarray:
    """Masked next-token CE through the FULL composite (vision towers +
    injection + LM), i.e. OCR fine-tuning on (image, transcript) pairs.
    Gradients flow into SAM/Qwen2/projector/separator as well as the LM;
    freeze towers by masking the optimizer (optax.masked) if desired."""
    from ..models.deepseek_ocr2 import normalize_pixels, ocr_prefill_embeds_batched

    b, s = ids.shape
    act = image_base.dtype if image_base.dtype != jnp.uint8 else jnp.bfloat16
    image_base = normalize_pixels(image_base, act)
    if patches is not None:
        patches = normalize_pixels(patches, act)
    embeds = ocr_prefill_embeds_batched(
        params, cfg, ids, image_base, patches, image_start
    )
    cache = make_kv_cache(
        cfg.lm.num_hidden_layers,
        b,
        cfg.lm.num_attention_heads,
        s,
        cfg.lm.head_dim,
        dtype=embeds.dtype,
    )
    hidden, _ = lm_forward(params["lm"], cfg.lm, embeds, cache, pos=0, is_prefill=True)
    logits = logits_all(params["lm"], hidden).astype(jnp.float32)
    m = loss_mask[:, 1:].astype(jnp.float32)
    # Masked positions may hold out-of-vocab ids (image placeholders, e.g.
    # 128815); CE on them is NaN and 0*NaN stays NaN — sanitize first.
    targets = jnp.where(m > 0, ids[:, 1:], 0)
    per_tok = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], targets
    )  # [B, S-1]
    return jnp.sum(per_tok * m) / jnp.maximum(jnp.sum(m), 1.0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "image_start", "tx"), donate_argnums=(0, 1)
)
def adamw_ocr_train_step(
    params, opt_state, cfg, ids, image_base, patches, image_start, loss_mask, tx
):
    """One AdamW step on (image, transcript) pairs; returns
    (new_params, new_opt_state, loss)."""
    with no_prefill_lift():
        loss, grads = jax.value_and_grad(ocr_loss)(
            params, cfg, ids, image_base, patches, image_start, loss_mask
        )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def _tree_flat(tree, prefix: str):
    """Flatten a pytree to {<prefix>/<keypath>: np.ndarray}, skipping empty
    nodes (optax EmptyState etc. flatten to no leaves)."""
    import numpy as np

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = prefix + jax.tree_util.keystr(path)
        out[name] = np.asarray(leaf)
    return out


def save_train_state(path: str, params, opt_state, step: int) -> None:
    """Checkpoint the FULL fine-tuning state (params + optimizer moments +
    step) to one safetensors file. Beyond the reference (inference-only);
    the params half uses the same flat naming as `save_flat` consumers.
    Written via temp-file + rename so a crash mid-save never destroys the
    previous checkpoint."""
    import os

    import numpy as np

    from ..io.safetensors_io import save_flat

    flat = _tree_flat(params, "params")
    flat.update(_tree_flat(opt_state, "opt"))
    flat["step"] = np.asarray(step, np.int64)
    tmp = path + ".tmp"
    save_flat(flat, tmp)
    os.replace(tmp, path)


def load_train_state(path: str, params_template, opt_state_template):
    """Restore (params, opt_state, step) saved by `save_train_state`.

    Templates supply the tree structure (build them with the model's
    init/params_from_flat + tx.init); leaves are loaded by keypath and cast
    to each template leaf's dtype so resumed training is bit-identical."""
    from ..io.safetensors_io import load_flat

    flat = load_flat(path)

    def restore(tree, prefix):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        vals = []
        for path_k, leaf in leaves:
            name = prefix + jax.tree_util.keystr(path_k)
            if name not in flat:
                raise KeyError(f"checkpoint missing {name!r}")
            # safetensors stores 0-d scalars (optax counts) as shape (1,);
            # reshape to the template leaf so the jitted step doesn't see a
            # new shape and recompile (and re-save the mutated shape).
            val = jnp.asarray(flat[name], dtype=leaf.dtype)
            vals.append(val.reshape(jnp.shape(leaf)))
        return jax.tree_util.tree_unflatten(treedef, vals)

    params = restore(params_template, "params")
    opt_state = restore(opt_state_template, "opt")
    import numpy as np

    return params, opt_state, int(np.asarray(flat["step"]).reshape(())[()])


@functools.partial(
    jax.jit, static_argnames=("cfg", "tx", "remat"), donate_argnums=(0, 1)
)
def adamw_train_step(
    params, opt_state, cfg: DeepseekV2Config, ids: jnp.ndarray, tx,
    remat: bool = False,
) -> Tuple[dict, object, jnp.ndarray]:
    """One AdamW step; returns (new_params, new_opt_state, loss).

    Gradients flow through the Pallas visit-scheduled MoE backward on TPU
    (ops/moe_gmm._moe_ffn_gmm_bwd); params and optimizer moments are
    donated so the update is in-place at XLA level.
    """
    with no_prefill_lift():  # backward must see unstacked experts (scan xs)
        loss, grads = jax.value_and_grad(lm_loss)(params, cfg, ids, remat)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
