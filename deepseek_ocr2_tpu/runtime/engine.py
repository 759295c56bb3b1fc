"""Batched multi-page OCR engine.

Beyond-reference capability (BASELINE.json north star): the reference is
strictly batch=1 (deepseek_ocr2.rs:140). This engine:

- preprocesses pages on the host and groups them by crop grid (pages in a
  group share the prompt length and vision geometry),
- runs the vision towers as one batched prefill per group (crops flatten
  into a single SAM batch),
- decodes the whole group with the batched single-dispatch greedy loop.

v0 is synchronous group-batched serving; prefill/decode overlap and
continuous batching land on top of the same jitted pieces.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..models import deepseek_ocr2 as ocr2
from ..runtime.pipeline import GenerationResult, OCR2Pipeline
from ..utils.tokenizer import decode_output, tokenize_with_image
from .generate import greedy_generate
from .kv_cache import bucket_capacity


@functools.partial(jax.jit, static_argnames=("cfg", "image_start", "act_dtype"))
def _batched_vision_prefill(params, cfg, input_ids, image_base, patches, image_start, act_dtype):
    image_base = ocr2.normalize_pixels(image_base, act_dtype)
    if patches is not None:
        patches = ocr2.normalize_pixels(patches, act_dtype)
    return ocr2.ocr_prefill_embeds_batched(
        params, cfg, input_ids, image_base, patches, image_start
    )


class OCR2Engine:
    def __init__(self, pipeline: OCR2Pipeline, batch_size: int = 8):
        self.pipe = pipeline
        self.batch_size = batch_size

    def run(
        self,
        images: Sequence[Union[str, Image.Image]],
        prompt: Optional[str] = None,
        max_new_tokens: int = 512,
        no_crop: bool = False,
        ngram_size: int = 20,
        rotate: int = 0,
        auto_rotate: bool = False,
        sampling: Optional[dict] = None,
    ) -> List[GenerationResult]:
        cfg = self.pipe.cfg
        prompt = prompt or cfg.default_ocr_prompt

        # Host preprocessing; group by crop grid so shapes are uniform.
        groups: Dict[Tuple[int, int], List[Tuple[int, np.ndarray, Optional[np.ndarray]]]] = (
            defaultdict(list)
        )
        for idx, image in enumerate(images):
            base, patches, ratio, _ = self.pipe.preprocess_image(
                image, no_crop=no_crop, rotate=rotate, auto_rotate=auto_rotate
            )
            groups[ratio].append((idx, base[0], patches))

        results: List[Optional[GenerationResult]] = [None] * len(images)
        chunk_index = 0
        for ratio, items in groups.items():
            ids, mask, image_start = tokenize_with_image(
                self.pipe.tokenizer, prompt, cfg, ratio
            )
            for chunk_start in range(0, len(items), self.batch_size):
                chunk = items[chunk_start : chunk_start + self.batch_size]
                # Distinct PRNG stream per chunk: otherwise every chunk (and
                # crop-ratio group) reuses step-k randomness, correlating
                # samples across pages.
                chunk_sampling = sampling
                if sampling:
                    chunk_sampling = {
                        **sampling,
                        "seed": sampling.get("seed", 0) + chunk_index,
                    }
                self._run_chunk(
                    chunk, ids, image_start, max_new_tokens, ngram_size, results,
                    chunk_sampling,
                )
                chunk_index += 1
        return results  # type: ignore[return-value]

    def _run_chunk(
        self, chunk, ids, image_start, max_new_tokens, ngram_size, results, sampling=None
    ):
        import time

        cfg = self.pipe.cfg
        b = len(chunk)
        # Device-resized pixels are already jax arrays: stack on device rather
        # than forcing a device->host round trip through np.stack.
        stack = jnp.stack if isinstance(chunk[0][1], jax.Array) else np.stack
        bases = stack([base for _, base, _ in chunk])  # [B, 3, S, S]
        if chunk[0][2] is not None:
            patches = stack([p for _, _, p in chunk])  # [B, P, 3, c, c]
        else:
            patches = None

        t0 = time.perf_counter()
        ids_arr = jnp.asarray(np.tile(np.asarray(ids, np.int32), (b, 1)))
        embeds = _batched_vision_prefill(
            self.pipe.params,
            cfg,
            ids_arr,
            jnp.asarray(bases),
            None if patches is None else jnp.asarray(patches),
            image_start,
            self.pipe.act_dtype,
        )
        # Timing barrier: block_until_ready does not sync on the tunneled
        # platform; a tiny host transfer is the only reliable phase boundary.
        np.asarray(embeds[0, 0, :1])
        t1 = time.perf_counter()

        prompt_len = len(ids)
        capacity = bucket_capacity(prompt_len + max_new_tokens)
        lookup = getattr(self.pipe, "lookup_chunk", 0)
        if lookup > 1 and not sampling:
            from .generate import lookup_greedy_generate_batched

            tokens, n_gen = lookup_greedy_generate_batched(
                self.pipe.params["lm"],
                cfg.lm,
                embeds,
                ids_arr,
                max_new_tokens=max_new_tokens,
                ngram_size=ngram_size,
                eos_id=cfg.eos_token_id,
                capacity=bucket_capacity(prompt_len + max_new_tokens + lookup - 1),
                kv_dtype=self.pipe.kv_dtype,
                chunk=lookup,
            )
        else:
            tokens, n_gen = greedy_generate(
                self.pipe.params["lm"],
                cfg.lm,
                embeds,
                ids_arr,
                max_new_tokens=max_new_tokens,
                ngram_size=ngram_size,
                eos_id=cfg.eos_token_id,
                capacity=capacity,
                kv_dtype=self.pipe.kv_dtype,
                **(sampling or {}),
            )
        tokens = np.asarray(jax.block_until_ready(tokens))
        n_gen = np.asarray(n_gen)
        t2 = time.perf_counter()

        # Chunk-level phase walls (pages in a chunk run concurrently; the
        # per-page attribution is the chunk's).
        prefill_s, decode_s = t1 - t0, t2 - t1
        for row, (idx, _, _) in enumerate(chunk):
            total = prompt_len + int(n_gen[row])
            all_ids = tokens[row, :total].tolist()
            gen_ids = all_ids[prompt_len:]
            text = decode_output(self.pipe.tokenizer, gen_ids, cfg.stop_string)
            results[idx] = GenerationResult(
                text=text,
                token_ids=all_ids,
                prompt_len=prompt_len,
                prefill_seconds=prefill_s,
                decode_seconds=decode_s,
                new_tokens=len(gen_ids),
            )
