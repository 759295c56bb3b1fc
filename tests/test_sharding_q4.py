"""int4 params under the (dp, mp) mesh: sharded greedy decode must be
token-exact vs the same q4 params unsharded (the q4 packed axis has 256-row
block granularity, so the q4 specs shard the output axis — see
parallel/sharding.lm_param_specs_q8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepseek_ocr2_tpu.configs import tiny_lm_config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.parallel import lm_param_specs_q8, make_mesh, shard_params
from deepseek_ocr2_tpu.runtime.generate import greedy_generate


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_lm_config()
    params = dsv2.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (4, 12)), jnp.int32)
    return cfg, params, ids


@pytest.fixture(autouse=True)
def _force_xla_paths(monkeypatch):
    monkeypatch.setenv("DEEPSEEK_NO_PALLAS", "1")
    jax.clear_caches()
    yield
    jax.clear_caches()


def _decode(params, cfg, ids):
    embeds = jnp.take(params["embed"], ids, axis=0)
    tokens, n_gen = greedy_generate(
        params, cfg, embeds, ids,
        max_new_tokens=6, ngram_size=3, eos_id=1, capacity=32, kv_dtype="float32",
    )
    return np.asarray(tokens), np.asarray(n_gen)


@pytest.mark.parametrize("scope", ["experts", "full"])
def test_q4_sharded_decode_token_exact(setup, scope):
    cfg, params, ids = setup
    params_q4 = dsv2.quantize_lm_params(params, scope=scope, bits=4)
    cpu0 = jax.devices("cpu")[0]
    params_cpu = jax.device_put(params_q4, cpu0)
    want_tok, want_n = _decode(params_cpu, cfg, jax.device_put(ids, cpu0))

    mesh = make_mesh(dp=4, mp=2, devices=jax.devices("cpu")[:8])
    specs = lm_param_specs_q8(cfg, params_q4)
    jax.tree_util.tree_map(lambda a, s: None, params_q4, specs)
    sharded = shard_params(params_q4, mesh, specs)
    with mesh:
        got_tok, got_n = _decode(sharded, cfg, ids)
    assert np.array_equal(got_n, want_n)
    assert np.array_equal(got_tok, want_tok)
