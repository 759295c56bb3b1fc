"""int8 params under the (dp, mp) mesh — VERDICT r1 #9 / SURVEY §2 EP.

The fused Pallas q8 kernels are single-device; on a multi-chip mesh the XLA
dequant paths run (pallas_enabled() is False on the CPU test platform), and
GSPMD must partition them without changing the math: greedy decode on
sharded q8 params must be token-exact vs the same q8 params unsharded.
"""

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
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (4, 12)), jnp.int32)
    return cfg, params, ids


@pytest.fixture(autouse=True)
def _force_xla_paths(monkeypatch):
    """Both decode runs live on the virtual CPU devices, but the process's
    default backend may be a real TPU (pallas_enabled() consults it at trace
    time, and it is not part of the jit cache key) — force the XLA paths and
    drop cached traces on both sides of the test."""
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
def test_q8_sharded_decode_token_exact(setup, scope):
    cfg, params, ids = setup
    params_q8 = dsv2.quantize_lm_params(params, scope=scope)
    # Reference run on one CPU device (same backend as the mesh: the check is
    # "sharding changes nothing", not CPU-vs-TPU numerics).
    cpu0 = jax.devices("cpu")[0]
    params_cpu = jax.device_put(params_q8, cpu0)
    want_tok, want_n = _decode(params_cpu, cfg, jax.device_put(ids, cpu0))

    mesh = make_mesh(dp=4, mp=2, devices=jax.devices("cpu")[:8])
    specs = lm_param_specs_q8(cfg, params_q8)
    # The spec tree must be congruent with the quantized param tree.
    jax.tree_util.tree_map(lambda a, s: None, params_q8, specs)
    sharded = shard_params(params_q8, mesh, specs)
    with mesh:
        got_tok, got_n = _decode(sharded, cfg, ids)
    assert np.array_equal(got_n, want_n)
    assert np.array_equal(got_tok, want_tok)


def test_sharded_batched_lookup_token_exact(setup):
    """Batched prompt-lookup decode (ragged chunk attention: per-(row,step)
    KV scatter + per-row causal masks) under the (4,2) mesh must match the
    same q8 params unsharded — GSPMD partitioning changes nothing."""
    from deepseek_ocr2_tpu.runtime.generate import lookup_greedy_generate_batched

    cfg, params, ids = setup
    params_q8 = dsv2.quantize_lm_params(params, scope="full")

    def _lookup(p, ids_):
        embeds = jnp.take(p["embed"], ids_, axis=0)
        t, n = lookup_greedy_generate_batched(
            p, cfg, embeds, ids_,
            max_new_tokens=6, ngram_size=3, eos_id=1, capacity=32,
            kv_dtype="float32", chunk=3,
        )
        return np.asarray(t), np.asarray(n)

    cpu0 = jax.devices("cpu")[0]
    want_tok, want_n = _lookup(
        jax.device_put(params_q8, cpu0), jax.device_put(ids, cpu0)
    )

    mesh = make_mesh(dp=4, mp=2, devices=jax.devices("cpu")[:8])
    sharded = shard_params(params_q8, mesh, lm_param_specs_q8(cfg, params_q8))
    with mesh:
        got_tok, got_n = _lookup(sharded, ids)
    assert np.array_equal(got_n, want_n)
    assert np.array_equal(got_tok, want_tok)


def test_sharded_continuous_engine_token_exact():
    """The continuous paged engine under a (4,2) TP/EP mesh must reproduce
    the unsharded engine's tokens exactly — including the paged lookup
    chunk path (chunk scatter + per-query budgets partitioned by GSPMD).

    The engine creates its state arrays internally (uncommitted), so only
    the LM params are committed to the mesh; jax.default_device pins the
    uncommitted side to the same backend when the process default is a TPU.
    """
    import dataclasses

    from PIL import Image

    from deepseek_ocr2_tpu.configs import tiny_ocr2_config
    from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
    from deepseek_ocr2_tpu.parallel import lm_param_specs
    from deepseek_ocr2_tpu.runtime.continuous import ContinuousOCREngine
    from deepseek_ocr2_tpu.runtime.pipeline import OCR2Pipeline

    import reference_torch_vision as refv
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers

    cfg = dataclasses.replace(tiny_ocr2_config(), image_token_id=500)
    flat = refv.random_ocr2_flat(cfg, seed=21)
    params, report = ocr2.params_from_flat(flat, cfg)
    report.raise_on_errors()

    tok = Tokenizer(
        tok_models.WordLevel(
            {"<unk>": 2, "Free": 10, "OCR.": 11, "hello": 13}, unk_token="<unk>"
        )
    )
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()

    rng = np.random.default_rng(9)
    pages = [
        Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
        for _ in range(3)
    ]

    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        base = jax.tree_util.tree_map(jnp.asarray, params)
        pipe = OCR2Pipeline(
            base, cfg, tok, kv_dtype="float32", act_dtype="float32"
        )
        plain = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
        want = plain.run(pages, max_new_tokens=6, ngram_size=3)

        mesh = make_mesh(dp=4, mp=2, devices=jax.devices("cpu")[:8])
        sharded_lm = shard_params(base["lm"], mesh, lm_param_specs(cfg.lm))
        spipe = OCR2Pipeline(
            {**base, "lm": sharded_lm}, cfg, tok,
            kv_dtype="float32", act_dtype="float32",
        )
        with mesh:
            for lookup in (0, 3):
                eng = ContinuousOCREngine(
                    spipe, slots=2, capacity=128, chunk_steps=4,
                    lookup_chunk=lookup,
                )
                got = eng.run(pages, max_new_tokens=6, ngram_size=3)
                for w, g in zip(want, got):
                    assert g.token_ids == w.token_ids, lookup
