"""Long-output continuous serving (BASELINE config #5): 2k+ new tokens.

The paged pool + lazy growth + preemption + (optional) lookup decode were
built exactly for this workload, but r3 only ever measured 32-token serves.
This bench runs the continuous engine ONLINE (start/submit/stop) at 2048
new tokens x 16 no-crop pages and reports:

- pages/s, aggregate decode tok/s, wall time;
- pool occupancy over time (polled) + preemption count, for a full pool
  and for a deliberately tight pool (~60%% of worst-case) that must
  preempt and still finish;
- int8-KV drift: the same pages decoded with --kv-cache int8 vs the bf16
  pool — first-divergence position per page and mean matching-prefix
  length (int8 KV is documented not-token-exact; this quantifies it at
  the length it exists for). NOTE: synthetic random weights make greedy
  margins pathologically tight, so the divergence here is a WORST-CASE
  bound, not an accuracy claim for real checkpoints.

EOS is disabled (eos_token_id=-1) so every page decodes the full budget —
the throughput number is deterministic-length.

Run manually on an idle TPU (one TPU process at a time).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from tokenizers import Tokenizer, models, pre_tokenizers

from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.runtime.continuous import ContinuousOCREngine
from deepseek_ocr2_tpu.runtime.kv_cache import bucket_capacity
from deepseek_ocr2_tpu.runtime.pipeline import OCR2Pipeline

MAX_NEW = 2048
N_PAGES = 16
SLOTS = 8
NGRAM = 20
PROMPT_LEN = 262  # no-crop: 1 + 257 + 4


def make_tok():
    tok = Tokenizer(
        models.WordLevel({"<unk>": 2, "Free": 10, "OCR.": 11}, unk_token="<unk>")
    )
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return tok


def run_engine(params, cfg, pages, kv_dtype, pool_tokens, lookup=0, quant=None):
    lm = params["lm"]
    if quant:
        from deepseek_ocr2_tpu.models.deepseek_v2 import quantize_lm_params

        lm = quantize_lm_params(lm, scope="full", bits=4 if quant == "int4" else 8)
    p = dict(params)
    p["lm"] = lm
    pipe = OCR2Pipeline(p, cfg, make_tok(), kv_dtype=kv_dtype)
    cap = bucket_capacity(PROMPT_LEN + MAX_NEW + max(lookup - 1, 0))
    engine = ContinuousOCREngine(
        pipe,
        slots=SLOTS,
        capacity=cap,
        chunk_steps=64,
        pool_tokens=pool_tokens,
        lookup_chunk=lookup,
    )
    # Warmup: compiles admission (g up to 8) + decode shapes.
    engine.run(
        pages[:8], prompt="<image> Free OCR.", max_new_tokens=64, ngram_size=NGRAM,
        no_crop=True,
    )
    occ = []
    stop_poll = threading.Event()

    def poll():
        while not stop_poll.wait(0.5):
            alloc = getattr(engine, "alloc", None)
            if alloc is not None:
                occ.append(1.0 - alloc.n_free / max(engine.num_pages - 1, 1))

    poller = threading.Thread(target=poll, daemon=True)
    poller.start()
    t0 = time.perf_counter()
    results = engine.run(
        pages, prompt="<image> Free OCR.", max_new_tokens=MAX_NEW,
        ngram_size=NGRAM, no_crop=True,
    )
    dt = time.perf_counter() - t0
    stop_poll.set()
    toks = sum(r.new_tokens for r in results)
    return dict(
        wall_s=dt,
        pages_per_sec=len(pages) / dt,
        tok_per_sec=toks / dt,
        new_tokens=toks,
        preempted=engine.last_preempted,
        lookup_forwards=engine.last_lookup_forwards,
        occ_max=max(occ) if occ else 0.0,
        occ_mean=float(np.mean(occ)) if occ else 0.0,
        gen_ids=[r.token_ids[r.prompt_len :] for r in results],
    )


def divergence(a_runs, b_runs):
    firsts, match = [], []
    for a, b in zip(a_runs, b_runs):
        n = min(len(a), len(b))
        d = next((i for i in range(n) if a[i] != b[i]), n)
        firsts.append(d)
        match.append(d / max(n, 1))
    return firsts, float(np.mean(match))


def main():
    cfg = OCR2Config()
    cfg = dataclasses.replace(cfg, eos_token_id=-1)  # full-budget decode
    print(f"device: {jax.devices()[0]}", flush=True)
    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(0), lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(7)
    pages = [
        Image.fromarray(rng.integers(0, 256, (960, 1280, 3), np.uint8))
        for _ in range(N_PAGES)
    ]
    full_pool = SLOTS * bucket_capacity(PROMPT_LEN + MAX_NEW)
    tight_pool = int(0.6 * full_pool)

    variants = [
        ("bf16-kv full-pool", dict(kv_dtype="bfloat16", pool_tokens=full_pool)),
        ("bf16-kv tight-pool", dict(kv_dtype="bfloat16", pool_tokens=tight_pool)),
        ("int8-kv full-pool", dict(kv_dtype="int8", pool_tokens=full_pool)),
        ("int8tail-kv full-pool", dict(kv_dtype="int8tail", pool_tokens=full_pool)),
        (
            "bf16-kv full-pool lookup4",
            dict(kv_dtype="bfloat16", pool_tokens=full_pool, lookup=4),
        ),
    ]
    if "--int4" in sys.argv:
        variants.insert(
            1,
            (
                "int4-w bf16-kv full-pool",
                dict(kv_dtype="bfloat16", pool_tokens=full_pool, quant="int4"),
            ),
        )
    results = {}
    for name, kw in variants:
        print(f"--- {name} (warmup+run) ---", flush=True)
        r = run_engine(params, cfg, pages, **kw)
        results[name] = r
        print(
            f"{name}: {r['pages_per_sec']:.3f} pages/s, {r['tok_per_sec']:.0f} tok/s, "
            f"{r['new_tokens']} tokens in {r['wall_s']:.1f}s, "
            f"preempted={r['preempted']}, occ max {r['occ_max']:.1%} / "
            f"mean {r['occ_mean']:.1%}"
            + (
                f", {r['new_tokens'] / max(r['lookup_forwards'], 1):.2f} tok/forward"
                if r["lookup_forwards"]
                else ""
            ),
            flush=True,
        )

    # NOTE on cross-run comparisons: token-exactness holds only for
    # identical admission grouping — the MoE prefill gmm sorts tokens
    # ACROSS the admission group, so a different group composition (tight
    # pool degrading to smaller power-of-two batches, partial cold-start
    # admission) shifts GEMM tile boundaries and rounds differently.
    # With synthetic random weights greedy margins are ~0, so any rounding
    # difference flips tokens — report match fractions, not booleans.
    # Within-engine determinism (preemption re-decode reproduces tokens)
    # is pinned by tests/test_continuous.py.
    base = results["bf16-kv full-pool"]
    tight = results["bf16-kv tight-pool"]
    firsts, frac = divergence(base["gen_ids"], tight["gen_ids"])
    print(
        f"tight-pool vs full-pool: mean matching prefix {frac:.1%} "
        "(differs only via admission-group GEMM rounding; see NOTE)"
    )
    for drift_name in ("int8-kv full-pool", "int8tail-kv full-pool"):
      if drift_name in results:
        firsts, frac = divergence(base["gen_ids"], results[drift_name]["gen_ids"])
        print(
            f"{drift_name} drift vs bf16 pool at {MAX_NEW} new tokens: first divergence "
            f"per page {firsts}, mean matching prefix {frac:.1%} (worst-case: "
            "random-weight greedy margins; real-checkpoint margins are far wider)",
            flush=True,
        )
    lk = results.get("bf16-kv full-pool lookup4")
    if lk is not None:
        firsts, frac = divergence(base["gen_ids"], lk["gen_ids"])
        print(
            f"lookup4 vs plain: mean matching prefix {frac:.1%} "
            "(chunk-width GEMM rounding; see NOTE)"
        )


if __name__ == "__main__":
    main()
