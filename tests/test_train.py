"""Training step: loss decreases under SGD on a tiny model (beyond-reference)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepseek_ocr2_tpu.configs import tiny_lm_config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.runtime.train import lm_loss, sgd_train_step


def test_sgd_reduces_loss():
    cfg = tiny_lm_config(num_hidden_layers=2)
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 24)), jnp.int32)

    first = float(lm_loss(params, cfg, ids))
    loss = None
    for _ in range(5):
        params, loss = sgd_train_step(params, cfg, ids, lr=5e-2)
    last = float(loss)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def test_grads_cover_all_params():
    cfg = tiny_lm_config(num_hidden_layers=2)
    params = dsv2.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    grads = jax.grad(lm_loss)(params, cfg, ids)
    flat, _ = jax.tree_util.tree_flatten(grads)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in flat)
    assert nonzero >= len(flat) - 1  # router of unused experts may be zero


def test_adamw_reduces_loss():
    from deepseek_ocr2_tpu.runtime.train import (
        adamw_train_step,
        init_opt_state,
        make_optimizer,
    )

    cfg = tiny_lm_config(num_hidden_layers=2)
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tx = make_optimizer(lr=5e-3)
    opt_state = init_opt_state(tx, params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 24)), jnp.int32)

    first = float(lm_loss(params, cfg, ids))
    loss = None
    for _ in range(5):
        params, opt_state, loss = adamw_train_step(params, opt_state, cfg, ids, tx)
    last = float(loss)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def test_train_state_checkpoint_resume(tmp_path):
    """Save/restore of the FULL train state (params + adamw moments + step):
    2 straight steps == 1 step -> checkpoint -> restore -> 1 step, bit-exact."""
    from deepseek_ocr2_tpu.runtime.train import (
        adamw_train_step,
        init_opt_state,
        load_train_state,
        make_optimizer,
        save_train_state,
    )

    cfg = tiny_lm_config(num_hidden_layers=2)
    tx = make_optimizer(lr=5e-3)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 24)), jnp.int32)

    def fresh():
        p = dsv2.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
        return p, init_opt_state(tx, p)

    # Straight: two steps, no checkpoint.
    params, opt_state = fresh()
    params, opt_state, _ = adamw_train_step(params, opt_state, cfg, ids, tx)
    params, opt_state, loss_straight = adamw_train_step(params, opt_state, cfg, ids, tx)

    # Resumed: one step, save, restore into fresh templates, one more step.
    p2, s2 = fresh()
    p2, s2, _ = adamw_train_step(p2, s2, cfg, ids, tx)
    ckpt = str(tmp_path / "train_state.safetensors")
    save_train_state(ckpt, p2, s2, step=1)
    tp, ts = fresh()  # templates only (structure + dtypes)
    p3, s3, step = load_train_state(ckpt, tp, ts)
    assert step == 1
    p3, s3, loss_resumed = adamw_train_step(p3, s3, cfg, ids, tx)

    assert float(loss_straight) == float(loss_resumed)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p3)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_matches_full_batch():
    """k micro-steps with MultiSteps == one step on the concatenated batch
    (grads average over equal-size micro-batches)."""
    from deepseek_ocr2_tpu.runtime.train import (
        adamw_train_step,
        init_opt_state,
        make_optimizer,
    )

    cfg = tiny_lm_config(num_hidden_layers=2)
    rng = np.random.default_rng(11)
    micro = [
        jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
        for _ in range(2)
    ]
    full = jnp.concatenate(micro, axis=0)

    p0 = dsv2.init_params(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)

    tx_full = make_optimizer(lr=5e-3)
    s = init_opt_state(tx_full, p0)
    p_full, _, _ = adamw_train_step(p0, s, cfg, full, tx_full)

    tx_acc = make_optimizer(lr=5e-3, grad_accum=2)
    p = dsv2.init_params(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    s = init_opt_state(tx_acc, p)
    for b in micro:
        p, s, _ = adamw_train_step(p, s, cfg, b, tx_acc)

    for a, b in zip(jax.tree_util.tree_leaves(p_full), jax.tree_util.tree_leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_ocr_train_step_reduces_loss_and_trains_towers():
    """OCR fine-tuning: masked CE through vision towers + injection + LM;
    loss falls and gradients reach SAM/Qwen2/projector."""
    from deepseek_ocr2_tpu.configs import tiny_ocr2_config
    from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
    from deepseek_ocr2_tpu.runtime.train import (
        adamw_ocr_train_step,
        init_opt_state,
        make_optimizer,
        ocr_loss,
    )

    cfg = tiny_ocr2_config()
    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(2), lm_dtype=jnp.float32, vision_dtype=jnp.float32
    )
    rng = np.random.default_rng(4)
    b = 2
    n_img = cfg.image_token_count((1, 1))  # no-crop: global view + separator
    start = 1  # BOS, then the placeholder block
    resp = 6
    s = start + n_img + resp
    ids = np.full((b, s), cfg.image_token_id, np.int64)
    ids[:, 0] = cfg.bos_token_id
    ids[:, start + n_img :] = rng.integers(2, cfg.lm.vocab_size, (b, resp))
    mask = np.zeros((b, s), np.float32)
    mask[:, start + n_img :] = 1.0  # train on the transcript only
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.asarray(mask)
    imgs = jnp.asarray(
        rng.uniform(-1, 1, (b, 3, cfg.base_image_size, cfg.base_image_size)),
        jnp.float32,
    )

    grads = jax.grad(ocr_loss)(params, cfg, ids, imgs, None, start, mask)
    for tower in ("sam", "qwen2", "projector"):
        total = sum(
            float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads[tower])
        )
        assert total > 0, f"no gradient reached {tower}"

    tx = make_optimizer(lr=3e-3)
    opt_state = init_opt_state(tx, params)
    first = float(ocr_loss(params, cfg, ids, imgs, None, start, mask))
    loss = None
    for _ in range(4):
        params, opt_state, loss = adamw_ocr_train_step(
            params, opt_state, cfg, ids, imgs, None, start, mask, tx
        )
    assert np.isfinite(first) and np.isfinite(float(loss))
    assert float(loss) < first, (first, float(loss))


def test_remat_matches_plain_backward():
    """jax.checkpoint on the MoE scan body must not change loss or grads."""
    cfg = tiny_lm_config(num_hidden_layers=3)
    params = dsv2.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 20)), jnp.int32)

    from deepseek_ocr2_tpu.models.deepseek_v2 import no_prefill_lift

    with no_prefill_lift():
        l0, g0 = jax.value_and_grad(lm_loss)(params, cfg, ids, False)
        l1, g1 = jax.value_and_grad(lm_loss)(params, cfg, ids, True)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
