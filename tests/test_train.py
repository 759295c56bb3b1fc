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
