"""Continuous-batching engine: token-exact vs the single-page pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from deepseek_ocr2_tpu.configs import tiny_ocr2_config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.runtime.continuous import ContinuousOCREngine
from deepseek_ocr2_tpu.runtime.pipeline import OCR2Pipeline

import reference_torch_vision as refv


def _tiny_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 2, "Free": 10, "OCR.": 11, "hello": 13}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return tok


@pytest.fixture(scope="module")
def setup():
    import dataclasses

    cfg = tiny_ocr2_config()
    cfg = dataclasses.replace(cfg, image_token_id=500)
    flat = refv.random_ocr2_flat(cfg, seed=21)
    params, report = ocr2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    pipe = OCR2Pipeline(params, cfg, _tiny_tokenizer(), kv_dtype="float32", act_dtype="float32")
    return cfg, pipe


def _pages(n):
    rng = np.random.default_rng(3)
    pages = []
    for i in range(n):
        # Different sizes: some trigger cropping (>=192), one does not.
        w, h = [(500, 300), (160, 120), (400, 400), (640, 200)][i % 4]
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        pages.append(Image.fromarray(arr))
    return pages


def test_continuous_matches_single(setup):
    cfg, pipe = setup
    pages = _pages(3)

    singles = [
        pipe.generate_ocr(p, max_new_tokens=6, ngram_size=3) for p in pages
    ]

    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    batched = engine.run(pages, max_new_tokens=6, ngram_size=3)

    for i, (s, b) in enumerate(zip(singles, batched)):
        assert b is not None, i
        assert b.token_ids == s.token_ids, (i, s.token_ids, b.token_ids)
        assert b.text == s.text


def test_continuous_more_pages_than_slots(setup):
    cfg, pipe = setup
    pages = _pages(5)
    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=3)
    results = engine.run(pages, max_new_tokens=4, ngram_size=0)
    assert all(r is not None for r in results)
    singles = [pipe.generate_ocr(p, max_new_tokens=4, ngram_size=0) for p in pages]
    for s, b in zip(singles, results):
        assert b.token_ids == s.token_ids


def test_continuous_max_new_tokens_one(setup):
    """Regression: slots whose first token hits the stop condition must be
    frozen at admission (done0), not decoded further by decode_chunk."""
    cfg, pipe = setup
    pages = _pages(2)
    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    results = engine.run(pages, max_new_tokens=1, ngram_size=0)
    singles = [pipe.generate_ocr(p, max_new_tokens=1, ngram_size=0) for p in pages]
    for s, b in zip(singles, results):
        assert b.new_tokens == 1
        assert b.token_ids == s.token_ids


def test_continuous_small_pool_token_exact(setup):
    """Memory elasticity: a pool holding ~half the slots*capacity tokens must
    still produce token-exact results (admissions wait for freed pages)."""
    cfg, pipe = setup
    pages = _pages(4)
    engine = ContinuousOCREngine(
        pipe, slots=2, capacity=128, chunk_steps=4, page_size=64, pool_tokens=128
    )
    results = engine.run(pages, max_new_tokens=5, ngram_size=3)
    singles = [pipe.generate_ocr(p, max_new_tokens=5, ngram_size=3) for p in pages]
    for s, b in zip(singles, results):
        assert b is not None
        assert b.token_ids == s.token_ids


def test_continuous_sampling_reproducible(setup):
    """Sampling in the continuous engine: same seed => same tokens, and the
    result must not depend on slot scheduling (per-page PRNG streams)."""
    cfg, pipe = setup
    pages = _pages(3)
    samp = dict(temperature=1.0, top_k=4, top_p=1.0, seed=13)
    e1 = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    r1 = e1.run(pages, max_new_tokens=5, ngram_size=0, sampling=dict(samp))
    e2 = ContinuousOCREngine(pipe, slots=3, capacity=128, chunk_steps=2)
    r2 = e2.run(pages, max_new_tokens=5, ngram_size=0, sampling=dict(samp))
    for a, b in zip(r1, r2):
        assert a.token_ids == b.token_ids
    r3 = e1.run(pages, max_new_tokens=5, ngram_size=0, sampling=dict(samp, seed=14))
    assert any(a.token_ids != c.token_ids for a, c in zip(r1, r3))


def test_continuous_int8_runs(setup):
    """Full-scope int8 params must work through the paged continuous path."""
    import dataclasses

    from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2

    cfg, pipe = setup
    qparams = dict(pipe.params)
    qparams["lm"] = dsv2.quantize_lm_params(pipe.params["lm"], scope="full")
    qpipe = OCR2Pipeline(
        qparams, cfg, pipe.tokenizer, kv_dtype="float32", act_dtype="float32"
    )
    pages = _pages(2)
    engine = ContinuousOCREngine(qpipe, slots=2, capacity=128, chunk_steps=4)
    results = engine.run(pages, max_new_tokens=4, ngram_size=0)
    for r in results:
        assert r is not None and r.new_tokens >= 1


def test_continuous_per_page_metrics(setup):
    """Per-page phase metrics must be populated (were dead 0.0 fields)."""
    cfg, pipe = setup
    pages = _pages(2)
    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    results = engine.run(pages, max_new_tokens=4, ngram_size=0)
    for r in results:
        assert r.prefill_seconds > 0
        assert r.decode_seconds > 0


def test_continuous_page_growth_preemption(setup):
    """Lazy page allocation: admission claims prompt+first-chunk pages only,
    mid-decode growth allocates the rest, and on pool exhaustion the youngest
    slot is preempted and re-admitted. Results stay token-exact (greedy
    decode is deterministic, so the re-run reproduces the evicted tokens)."""
    from deepseek_ocr2_tpu.runtime.paged_kv import pages_for
    from deepseek_ocr2_tpu.utils.tokenizer import tokenize_with_image

    cfg, pipe = setup
    pages = _pages(2)[1:2] * 2  # two identical no-crop pages
    ids, _, _ = tokenize_with_image(pipe.tokenizer, cfg.default_ocr_prompt, cfg, (1, 1))
    s = len(ids)
    page_size, max_new, chunk = 16, 64, 8
    assert s + max_new <= 128
    per_admit = pages_for(min(s + 1 + chunk, s + max_new), page_size)
    full = pages_for(s + max_new, page_size)
    # Both slots can admit and partially grow, but not both reach full size.
    pool_pages = max(2 * per_admit + (full - per_admit) + (full - per_admit) // 2,
                     pages_for(128, page_size))
    engine = ContinuousOCREngine(
        pipe, slots=2, capacity=128, chunk_steps=chunk,
        page_size=page_size, pool_tokens=pool_pages * page_size,
    )
    results = engine.run(pages, max_new_tokens=max_new, ngram_size=3)
    assert engine.last_preempted >= 1, "pool sizing did not force a preemption"
    singles = [pipe.generate_ocr(p, max_new_tokens=max_new, ngram_size=3) for p in pages]
    for ref, b in zip(singles, results):
        assert b is not None
        assert b.token_ids == ref.token_ids

    # Sampling must be preemption-invariant too: the PRNG key folds
    # (seed, page_index, position), so a re-admitted page replays its stream.
    samp = dict(temperature=1.0, top_k=4, top_p=1.0, seed=13)
    tight = engine.run(pages, max_new_tokens=max_new, ngram_size=0, sampling=dict(samp))
    roomy = ContinuousOCREngine(
        pipe, slots=2, capacity=128, chunk_steps=chunk, page_size=page_size
    ).run(pages, max_new_tokens=max_new, ngram_size=0, sampling=dict(samp))
    for a, b2 in zip(tight, roomy):
        assert a.token_ids == b2.token_ids


def test_continuous_lookup_token_exact(setup):
    """Prompt-lookup speculative decoding in the continuous engine must be
    token-exact vs the plain continuous engine (greedy), and must report
    the chunk-forward count it used."""
    cfg, pipe = setup
    pages = _pages(4)

    plain = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=8)
    want = plain.run(pages, max_new_tokens=12, ngram_size=3)

    engine = ContinuousOCREngine(
        pipe, slots=2, capacity=128, chunk_steps=8, lookup_chunk=4
    )
    got = engine.run(pages, max_new_tokens=12, ngram_size=3)

    for i, (w, g) in enumerate(zip(want, got)):
        assert g is not None, i
        assert g.token_ids == w.token_ids, (i, w.token_ids, g.token_ids)
        assert g.text == w.text
    assert engine.last_lookup_forwards > 0


def test_continuous_lookup_small_pool_preemption_exact(setup):
    """Lookup decoding over a tight pool (page growth + preemption in play,
    speculative K/V writes spilling into the scratch page near limits) must
    stay token-exact vs the plain engine."""
    cfg, pipe = setup
    pages = _pages(4)
    plain = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    want = plain.run(pages, max_new_tokens=9, ngram_size=3)
    engine = ContinuousOCREngine(
        pipe, slots=2, capacity=128, chunk_steps=4, page_size=16,
        pool_tokens=192, lookup_chunk=3,
    )
    got = engine.run(pages, max_new_tokens=9, ngram_size=3)
    for w, g in zip(want, got):
        assert g is not None
        assert g.token_ids == w.token_ids


def test_continuous_lookup_int8_runs(setup):
    """Full-scope int8 through the chunked paged path (q8 qkv/wo/ffn at
    chunk width) must produce the same tokens as plain int8 continuous."""
    from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2

    cfg, pipe = setup
    qparams = dict(pipe.params)
    qparams["lm"] = dsv2.quantize_lm_params(pipe.params["lm"], scope="full")
    qpipe = OCR2Pipeline(
        qparams, cfg, pipe.tokenizer, kv_dtype="float32", act_dtype="float32"
    )
    pages = _pages(2)
    plain = ContinuousOCREngine(qpipe, slots=2, capacity=128, chunk_steps=4)
    want = plain.run(pages, max_new_tokens=6, ngram_size=0)
    engine = ContinuousOCREngine(
        qpipe, slots=2, capacity=128, chunk_steps=4, lookup_chunk=3
    )
    got = engine.run(pages, max_new_tokens=6, ngram_size=0)
    for w, g in zip(want, got):
        assert g is not None
        assert g.token_ids == w.token_ids


def test_continuous_lookup_int4_runs(setup):
    """Full-scope int4 (w4a16) through the chunked paged lookup path must
    produce the same tokens as plain int4 continuous decode."""
    from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2

    cfg, pipe = setup
    qparams = dict(pipe.params)
    qparams["lm"] = dsv2.quantize_lm_params(pipe.params["lm"], scope="full", bits=4)
    qpipe = OCR2Pipeline(
        qparams, cfg, pipe.tokenizer, kv_dtype="float32", act_dtype="float32"
    )
    pages = _pages(2)
    plain = ContinuousOCREngine(qpipe, slots=2, capacity=128, chunk_steps=4)
    want = plain.run(pages, max_new_tokens=6, ngram_size=0)
    engine = ContinuousOCREngine(
        qpipe, slots=2, capacity=128, chunk_steps=4, lookup_chunk=3
    )
    got = engine.run(pages, max_new_tokens=6, ngram_size=0)
    for w, g in zip(want, got):
        assert g is not None
        assert g.token_ids == w.token_ids


def test_continuous_lookup_rejects_sampling(setup):
    cfg, pipe = setup
    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, lookup_chunk=4)
    with pytest.raises(ValueError):
        engine.run(_pages(1), max_new_tokens=4, sampling=dict(temperature=1.0))


def test_continuous_no_mutual_preemption_livelock(setup):
    """Regression: two slots in a pool too small for both to finish used to
    evict EACH OTHER forever (A grows -> preempts B; B re-admits, grows ->
    preempts A; repeat). Growth now only preempts strictly-younger slots
    (self-preempting when none exist), so the oldest sequence always
    finishes and the run terminates — token-exact vs the plain engine."""
    import signal

    cfg, pipe = setup
    pages = _pages(4)

    def _bail(signum, frame):
        raise TimeoutError("continuous engine livelocked (mutual preemption)")

    old = signal.signal(signal.SIGALRM, _bail)
    signal.alarm(1200)
    try:
        # The reproducing config: both crop pages admit at 5 pages, both
        # need a 6th to finish, pool holds 10.
        plain = ContinuousOCREngine(
            pipe, slots=2, capacity=128, chunk_steps=32, page_size=16,
            pool_tokens=160,
        )
        want = plain.run(pages, max_new_tokens=48, ngram_size=3)
        engine = ContinuousOCREngine(
            pipe, slots=2, capacity=128, chunk_steps=32, page_size=16,
            pool_tokens=160, lookup_chunk=4,
        )
        got = engine.run(pages, max_new_tokens=48, ngram_size=3)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    for w, g in zip(want, got):
        assert g is not None
        assert g.token_ids == w.token_ids


def test_continuous_lookup_accelerates_deterministic_cycle():
    """Engine-level proof the paged speculative path actually accelerates:
    the Markov LM from test_lookup_decode (zeroed attention/MLP, embed ->
    lm_head maps t to t+1 mod period) emits a strict cycle, so after the
    prompt every draft must accept and decode_chunk_lookup must emit
    chunk tokens per forward (attention is zeroed, so the synthetic paged
    pool contents are irrelevant by construction)."""
    from deepseek_ocr2_tpu.configs import tiny_lm_config
    from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
    from deepseek_ocr2_tpu.runtime.continuous import decode_chunk_lookup
    from deepseek_ocr2_tpu.runtime.paged_kv import make_paged_kv_cache, pages_for

    cfg = tiny_lm_config(num_hidden_layers=2)
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    h, period = cfg.hidden_size, 24
    assert period <= h

    emb = np.zeros((cfg.vocab_size, h), np.float32)
    for t in range(period):
        emb[t, t % h] = 1.0
    lm_head = np.zeros((h, cfg.vocab_size), np.float32)
    for t in range(period):
        lm_head[t, (t + 1) % period] = 1.0

    def zeroed(tree):
        return jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), tree)

    params = dict(params)
    params["embed"] = jnp.asarray(emb)
    params["lm_head"] = jnp.asarray(lm_head)
    params["layers_dense"] = zeroed(params["layers_dense"])
    lm = {
        k: zeroed(params["layers_moe"][k]) for k in ("attn", "experts", "shared")
    }
    params["layers_moe"] = {**params["layers_moe"], **lm}

    prompt = list(range(period)) + list(range(4))
    s_len = len(prompt)
    b, tok_cap, page, chunk, n_steps = 2, 256, 64, 6, 16
    max_new = n_steps * chunk  # 96: full acceptance covers it exactly

    toks = np.zeros((b, tok_cap), np.int32)
    toks[:, :s_len] = prompt
    n_pages_per = pages_for(tok_cap, page)
    cache = make_paged_kv_cache(
        cfg.num_hidden_layers, b * n_pages_per + 1, cfg.num_attention_heads,
        page, cfg.head_dim, jnp.float32,
    )
    tables = jnp.asarray(
        np.arange(1, b * n_pages_per + 1, dtype=np.int32).reshape(b, n_pages_per)
    )

    _, tokens, cur_lens, done, status = decode_chunk_lookup(
        params,
        cache,
        jnp.asarray(toks),
        jnp.full((b,), s_len, jnp.int32),
        jnp.zeros((b,), bool),
        jnp.full((b,), s_len + max_new, jnp.int32),
        tables,
        cfg,
        n_steps=n_steps,
        chunk=chunk,
        match_n=2,
        ngram_size=0,
        eos_id=255,
    )
    status = np.asarray(status)
    forwards = int(status[2 * b])
    want = [(3 + i + 1) % period for i in range(max_new)]
    for row in range(b):
        assert int(status[row]) == s_len + max_new
        np.testing.assert_array_equal(
            np.asarray(tokens)[row, s_len : s_len + max_new], want
        )
    # Full acceptance: 96 tokens in exactly n_steps=16 chunk forwards.
    assert forwards <= n_steps + 1, f"speculation did not accelerate: {forwards}"


def test_online_submit_while_running(setup):
    """ONLINE serving: requests submitted while the loop is decoding join
    the running batch and resolve token-exact vs the single-page pipeline,
    including mixed per-request max_new_tokens within one admission group."""
    import time as _time

    cfg, pipe = setup
    pages = _pages(4)
    budgets = [6, 9, 6, 5]

    singles = [
        pipe.generate_ocr(p, max_new_tokens=m, ngram_size=3)
        for p, m in zip(pages, budgets)
    ]

    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    engine.start(ngram_size=3)
    try:
        futs = []
        for p, m in zip(pages, budgets):
            futs.append(engine.submit(p, max_new_tokens=m))
            _time.sleep(0.05)  # land some submissions mid-decode
        results = [f.result(timeout=300) for f in futs]
    finally:
        engine.stop(timeout=60)

    for i, (s, r) in enumerate(zip(singles, results)):
        assert r.token_ids == s.token_ids, (i, s.token_ids, r.token_ids)
        assert r.text == s.text


def test_online_bad_image_fails_only_that_request(setup):
    """An unreadable image resolves ITS future with the error; other
    requests are unaffected."""
    cfg, pipe = setup
    good = _pages(1)[0]
    want = pipe.generate_ocr(good, max_new_tokens=4, ngram_size=0)

    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    engine.start(ngram_size=0)
    try:
        bad = engine.submit("/nonexistent/page.png", max_new_tokens=4)
        ok = engine.submit(good, max_new_tokens=4)
        res = ok.result(timeout=300)
        with pytest.raises(Exception):
            bad.result(timeout=300)
    finally:
        engine.stop(timeout=60)
    assert res.token_ids == want.token_ids


def test_online_stop_drains(setup):
    """stop() finishes queued work before the loop exits."""
    cfg, pipe = setup
    pages = _pages(2)
    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    engine.start(ngram_size=0)
    futs = [engine.submit(p, max_new_tokens=4) for p in pages]
    engine.stop(timeout=300)
    for f in futs:
        assert f.done()
        assert f.result(timeout=0).new_tokens >= 1


def test_continuous_int8_kv_pool_runs(setup):
    """int8-quantized KV pool (--kv-cache int8): the engine admits
    (quantizing at the pool boundary), decodes, looks up speculatively, and
    completes every page. Not token-exact vs f32 by design; numeric quality
    is pinned by the kernel/step tests in test_paged_attention."""
    cfg, pipe = setup
    qpipe = OCR2Pipeline(
        pipe.params, cfg, pipe.tokenizer, kv_dtype="int8", act_dtype="float32"
    )
    pages = _pages(3)
    for lookup in (0, 3):
        engine = ContinuousOCREngine(
            qpipe, slots=2, capacity=128, chunk_steps=4, lookup_chunk=lookup
        )
        results = engine.run(pages, max_new_tokens=5, ngram_size=3)
        for r in results:
            assert r is not None and r.new_tokens >= 1


def test_contiguous_cache_rejects_int8(setup):
    cfg, pipe = setup
    from deepseek_ocr2_tpu.runtime.kv_cache import make_kv_cache

    with pytest.raises(ValueError):
        make_kv_cache(2, 1, 2, 16, 8, jnp.int8)


def test_online_bad_request_does_not_kill_engine(setup):
    """A request whose budget exceeds engine capacity, or whose prompt has
    no <image> placeholder, fails ITS future; the engine keeps serving."""
    cfg, pipe = setup
    good = _pages(1)[0]
    want = pipe.generate_ocr(good, max_new_tokens=4, ngram_size=0)

    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    engine.start(ngram_size=0)
    try:
        too_big = engine.submit(good, max_new_tokens=10_000)
        bad_prompt = engine.submit(good, prompt="no placeholder here", max_new_tokens=4)
        with pytest.raises(ValueError):
            too_big.result(timeout=300)
        with pytest.raises(Exception):
            bad_prompt.result(timeout=300)
        ok = engine.submit(good, max_new_tokens=4)
        res = ok.result(timeout=300)
    finally:
        engine.stop(timeout=60)
    assert res.token_ids == want.token_ids


def test_online_start_rejects_lookup_with_sampling(setup):
    cfg, pipe = setup
    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, lookup_chunk=4)
    with pytest.raises(ValueError):
        engine.start(sampling=dict(temperature=1.0))


def test_text_stream_holdback():
    """_TextStream: stop-string fragments and split-UTF-8 bytes never leak
    into the emitted deltas, and the stop string cuts the stream."""
    from deepseek_ocr2_tpu.runtime.continuous import _TextStream

    class WordTok:
        table = {1: "he", 2: "llo ", 3: "wor", 4: "<D", 5: "ONE>", 6: "!"}

        def decode(self, ids, skip_special_tokens=False):
            return "".join(self.table[i] for i in ids)

    ts = _TextStream(WordTok(), stop_string="<DONE>")
    assert ts.push([1]) == "he"
    # "<D" is a prefix of the stop string: held back.
    assert ts.push([2, 4]) == "llo "
    assert not ts.stopped
    # Completing the stop string cuts there and never emits any of it.
    assert ts.push([5, 6]) == ""
    assert ts.stopped
    assert ts.push([6]) == ""

    class ByteTok:
        table = {1: b"a", 2: b"\xe2", 3: b"\x82\xac", 4: b"b"}

        def decode(self, ids, skip_special_tokens=False):
            return b"".join(self.table[i] for i in ids).decode("utf-8", "replace")

    ts = _TextStream(ByteTok())
    # "\xe2" alone decodes to U+FFFD: the partial sequence is held back.
    assert ts.push([1, 2]) == ""
    assert ts.push([3, 4]) == "a€b"


def test_continuous_streaming_online(setup):
    """Online streaming: per-chunk ids concatenate to exactly the final
    generated ids, across multiple emissions, and stream_text deltas
    reassemble the final text."""
    cfg, pipe = setup
    pages = _pages(2)
    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=2)
    engine.start(ngram_size=3)
    try:
        reqs = [engine.submit(p, max_new_tokens=6, stream=True) for p in pages]
        for req in reqs:
            chunks = list(req.stream_token_ids(timeout=600))
            res = req.result(timeout=10)
            got = [t for c in chunks for t in c]
            assert got == res.token_ids[res.prompt_len:]
            assert len(chunks) >= 2, "chunk_steps=2 must emit incrementally"
        # stream_text path (fresh request).
        req = engine.submit(pages[0], max_new_tokens=6, stream=True)
        text = "".join(
            req.stream_text(pipe.tokenizer, cfg.stop_string, timeout=600)
        )
        res = req.result(timeout=10)
        assert text.strip() == res.text
    finally:
        engine.stop(timeout=120)


def test_continuous_streaming_preemption_no_dup_no_gap(setup):
    """A preempted streaming request re-decodes deterministically; the
    per-request watermark must make that invisible to the stream (no
    duplicated, no missing tokens)."""
    from deepseek_ocr2_tpu.runtime.paged_kv import pages_for
    from deepseek_ocr2_tpu.utils.tokenizer import tokenize_with_image

    cfg, pipe = setup
    pages = _pages(2)[1:2] * 2  # two identical no-crop pages
    ids, _, _ = tokenize_with_image(
        pipe.tokenizer, cfg.default_ocr_prompt, cfg, (1, 1)
    )
    s = len(ids)
    page_size, max_new, chunk = 16, 64, 8
    per_admit = pages_for(min(s + 1 + chunk, s + max_new), page_size)
    full = pages_for(s + max_new, page_size)
    pool_pages = max(
        2 * per_admit + (full - per_admit) + (full - per_admit) // 2,
        pages_for(128, page_size),
    )
    engine = ContinuousOCREngine(
        pipe, slots=2, capacity=128, chunk_steps=chunk,
        page_size=page_size, pool_tokens=pool_pages * page_size,
    )
    engine.start(ngram_size=3)
    try:
        reqs = [
            engine.submit(p, max_new_tokens=max_new, stream=True) for p in pages
        ]
        outs = []
        for req in reqs:
            chunks = list(req.stream_token_ids(timeout=600))
            res = req.result(timeout=10)
            outs.append(([t for c in chunks for t in c], res))
    finally:
        engine.stop(timeout=120)
    assert engine.last_preempted >= 1, "pool sizing did not force a preemption"
    for got, res in outs:
        assert got == res.token_ids[res.prompt_len:]


def test_continuous_device_resize_token_exact(setup):
    """Continuous engine with the device-resize pixel path (prefetch worker
    stages device-resized uint8) is token-exact vs the host-PIL single-page
    pipeline."""
    cfg, pipe = setup
    pages = _pages(3)
    singles = [pipe.generate_ocr(p, max_new_tokens=5, ngram_size=3) for p in pages]
    pipe.device_resize = True
    try:
        engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
        batched = engine.run(pages, max_new_tokens=5, ngram_size=3)
    finally:
        pipe.device_resize = None
    for i, (s, b) in enumerate(zip(singles, batched)):
        assert b is not None, i
        assert b.token_ids == s.token_ids, i


def test_prestage_run_requests_token_exact(setup):
    """Staged mode (prestage + run_requests, VERDICT r4 #3) produces exactly
    the tokens of the normal run() path."""
    cfg, pipe = setup
    pages = _pages(3)

    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    normal = engine.run(pages, max_new_tokens=6, ngram_size=3)

    engine2 = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    reqs = engine2.prestage(pages, max_new_tokens=6)
    assert all(r.pre is not None for r in reqs)
    staged = engine2.run_requests(reqs, ngram_size=3)

    for i, (a, b) in enumerate(zip(normal, staged)):
        assert b.token_ids == a.token_ids, (i, a.token_ids, b.token_ids)
        assert b.text == a.text


def test_continuous_int8tail_kv_pool_runs(setup):
    """int8tail pool (--kv-cache int8tail, VERDICT r4 #7): int8 history +
    exact bf16 open page per slot. The engine admits (staging the prompt's
    last page into the open buffer), decodes across page rollovers, lookup-
    decodes, and completes deterministically (same run twice -> same
    tokens). Tail-read semantics are pinned by
    test_int8tail_last_page_exact_1query_and_chunk."""
    cfg, pipe = setup
    qpipe = OCR2Pipeline(
        pipe.params, cfg, pipe.tokenizer, kv_dtype="int8tail", act_dtype="float32"
    )
    pages = _pages(3)
    for lookup in (0, 3):
        engine = ContinuousOCREngine(
            qpipe, slots=2, capacity=128, chunk_steps=4, lookup_chunk=lookup
        )
        results = engine.run(pages, max_new_tokens=5, ngram_size=3)
        for r in results:
            assert r is not None and r.new_tokens >= 1
        results2 = ContinuousOCREngine(
            qpipe, slots=2, capacity=128, chunk_steps=4, lookup_chunk=lookup
        ).run(pages, max_new_tokens=5, ngram_size=3)
        for a, b2 in zip(results, results2):
            assert a.token_ids == b2.token_ids
