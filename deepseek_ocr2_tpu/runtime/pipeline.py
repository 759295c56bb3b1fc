"""End-to-end OCR / text-generation pipeline.

Host side: image decode, rotate/auto-rotate, pad-to-square, dynamic tiling,
tokenization. Device side: one jitted vision-prefill (per crop-count bucket)
plus the single-dispatch greedy decode loop. This is the TPU-native analogue
of the reference's `cmd_generate_ocr` / `cmd_generate_text` call stacks
(main.rs:1328-1634, 774-1025) with zero per-token host syncs.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..configs import OCR2Config
from ..models import deepseek_ocr2 as ocr2
from ..preprocess import auto_rotate_choice, rotate_image, should_crop
from ..utils.debug import dbg_print, dbg_stats, enabled
from ..utils.tokenizer import decode_output, tokenize_text, tokenize_with_image
from .generate import greedy_generate
from .kv_cache import bucket_capacity


@dataclasses.dataclass
class GenerationResult:
    text: str
    token_ids: List[int]
    prompt_len: int
    prefill_seconds: float
    decode_seconds: float
    new_tokens: int

    @property
    def decode_tokens_per_sec(self) -> float:
        return self.new_tokens / self.decode_seconds if self.decode_seconds > 0 else 0.0


@functools.partial(jax.jit, static_argnames=("cfg", "image_start", "act_dtype"))
def _vision_prefill(params, cfg: OCR2Config, input_ids, image_base, patches, image_start, act_dtype):
    image_base = image_base.astype(jnp.dtype(act_dtype))
    if patches is not None:
        patches = patches.astype(jnp.dtype(act_dtype))
    return ocr2.ocr_prefill_embeds(params, cfg, input_ids, image_base, patches, image_start)


class OCR2Pipeline:
    """Single-sequence pipeline matching the reference CLI semantics.

    Batched multi-page serving lives in runtime/engine.py.
    """

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: OCR2Config,
        tokenizer,
        kv_dtype: str = "bfloat16",
        act_dtype: str = "bfloat16",
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.kv_dtype = kv_dtype
        self.act_dtype = act_dtype

    # -- text ---------------------------------------------------------------

    def generate_text(
        self,
        prompt: str,
        max_new_tokens: int = 128,
        eos_token_id: Optional[int] = None,
        ngram_size: int = 0,
        sampling: Optional[dict] = None,
    ) -> GenerationResult:
        cfg = self.cfg
        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        ids = tokenize_text(self.tokenizer, prompt, bos_id=cfg.bos_token_id)
        ids_j = jnp.asarray(ids, jnp.int32)
        embeds = jnp.take(self.params["lm"]["embed"], ids_j, axis=0)[None].astype(
            jnp.dtype(self.act_dtype)
        )
        return self._generate(embeds, ids, max_new_tokens, ngram_size, eos, sampling)

    # -- OCR ----------------------------------------------------------------

    def preprocess_image(
        self,
        image: Union[str, Image.Image],
        no_crop: bool = False,
        rotate: Optional[int] = 0,
        auto_rotate: bool = False,
    ) -> Tuple[np.ndarray, Optional[np.ndarray], Tuple[int, int], int]:
        """Returns (image_base [1,3,S,S], patches [P,3,c,c] or None,
        crop_ratio, rotate_used)."""
        cfg = self.cfg
        img = Image.open(image).convert("RGB") if isinstance(image, str) else image.convert("RGB")

        rotate_used = rotate if rotate else 0
        if rotate_used == 0 and auto_rotate:
            rotate_used = auto_rotate_choice(img)
        dbg_print("DEEPSEEK_DEBUG_OCR", f"rotate_used={rotate_used}")
        img = rotate_image(img, rotate_used)

        patches = None
        crop_ratio = (1, 1)
        if should_crop(img, not no_crop, cfg.crop_image_size):
            from ..preprocess.image import candidate_ratios, find_closest_aspect_ratio, preprocess_tiles_nchw

            w, h = img.size
            ratios = candidate_ratios(cfg.min_crop_tiles, cfg.max_crop_tiles)
            crop_ratio = find_closest_aspect_ratio(
                w / h, ratios, w, h, cfg.crop_image_size
            )
            patches = preprocess_tiles_nchw(img, cfg.crop_image_size, crop_ratio)

        from ..preprocess.image import preprocess_base_nchw

        image_base = preprocess_base_nchw(img, cfg.base_image_size, cfg.pad_color)
        return image_base, patches, crop_ratio, rotate_used

    def generate_ocr(
        self,
        image: Union[str, Image.Image],
        prompt: Optional[str] = None,
        max_new_tokens: int = 512,
        no_crop: bool = False,
        rotate: Optional[int] = 0,
        auto_rotate: bool = False,
        ngram_size: int = 20,
        eos_token_id: Optional[int] = None,
        sampling: Optional[dict] = None,
    ) -> GenerationResult:
        cfg = self.cfg
        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        prompt = prompt or cfg.default_ocr_prompt

        t0 = time.perf_counter()
        image_base, patches, crop_ratio, _ = self.preprocess_image(
            image, no_crop=no_crop, rotate=rotate, auto_rotate=auto_rotate
        )
        ids, mask, image_start = tokenize_with_image(
            self.tokenizer, prompt, cfg, crop_ratio
        )

        embeds = jax.block_until_ready(
            self.build_ocr_embeds(ids, image_base, patches, image_start)
        )
        vision_seconds = time.perf_counter() - t0
        result = self._generate(embeds, ids, max_new_tokens, ngram_size, eos, sampling)
        result.prefill_seconds += vision_seconds
        return result

    def build_ocr_embeds(self, ids, image_base, patches, image_start):
        cfg = self.cfg
        ids_j = jnp.asarray(ids, jnp.int32)[None]
        if enabled("DEEPSEEK_DEBUG_VISION"):
            # Eager stage-by-stage path with stat dumps (reference C16 hooks).
            from ..models import qwen2 as qwen2_mod
            from ..models import sam as sam_mod

            def tower(imgs, tag):
                feats = sam_mod.sam_forward(self.params["sam"], cfg.sam, jnp.asarray(imgs))
                dbg_stats("DEEPSEEK_DEBUG_VISION", f"vision.{tag}.sam", feats)
                feats = qwen2_mod.qwen2_encode(self.params["qwen2"], cfg.qwen2, feats)
                dbg_stats("DEEPSEEK_DEBUG_VISION", f"vision.{tag}.qwen2", feats)
                out = feats @ self.params["projector"]["w"].astype(feats.dtype)
                out = out + self.params["projector"]["b"].astype(feats.dtype)
                dbg_stats("DEEPSEEK_DEBUG_VISION", f"vision.{tag}.proj", out)
                return out

            h = cfg.lm.hidden_size
            g = tower(image_base, "global").reshape(-1, h)
            sep = self.params["view_seperator"].reshape(1, h).astype(g.dtype)
            if patches is not None:
                loc = tower(patches, "local").reshape(-1, h)
                vision = jnp.concatenate([loc, g, sep], axis=0)
            else:
                vision = jnp.concatenate([g, sep], axis=0)
            dbg_stats("DEEPSEEK_DEBUG_VISION", "vision.tokens", vision)
            embeds = ocr2.build_inputs_embeds(self.params, cfg, ids_j, vision, image_start)
            dbg_stats("DEEPSEEK_DEBUG_VISION", "mm.merged", embeds)
            return embeds.astype(jnp.dtype(self.act_dtype))

        patches_j = None if patches is None else jnp.asarray(patches)
        return _vision_prefill(
            self.params, cfg, ids_j, jnp.asarray(image_base), patches_j, image_start, self.act_dtype
        )

    def _debug_prefill_dumps(self, embeds) -> None:
        """Reference debug channels: step-0 top-10 logits (DEEPSEEK_DEBUG_TOPK,
        main.rs:954-980) and the eager per-layer dumps (ATTN/MOE/LAYER0)."""
        from ..models.deepseek_v2 import lm_forward_debug, logits_last as _ll

        hidden = lm_forward_debug(self.params["lm"], self.cfg.lm, embeds)
        if enabled("DEEPSEEK_DEBUG_TOPK"):
            logits = np.asarray(_ll(self.params["lm"], hidden)[0], np.float32)
            order = np.argsort(-np.nan_to_num(logits, nan=-np.inf))[:10]
            toks = [
                self.tokenizer.decode([int(i)], skip_special_tokens=False)
                for i in order
            ]
            dbg_print("DEEPSEEK_DEBUG_TOPK", f"step0 top10 ids={order.tolist()}")
            dbg_print("DEEPSEEK_DEBUG_TOPK", f"step0 top10 tok={toks}")
            dbg_print(
                "DEEPSEEK_DEBUG_TOPK",
                f"step0 top10 logit={[round(float(logits[i]), 4) for i in order]}",
            )

    # -- shared decode ------------------------------------------------------

    def _generate(
        self, embeds, ids, max_new_tokens, ngram_size, eos, sampling=None
    ) -> GenerationResult:
        cfg = self.cfg
        prompt_len = len(ids)
        capacity = bucket_capacity(prompt_len + max_new_tokens)

        if any(
            enabled(c)
            for c in (
                "DEEPSEEK_DEBUG_TOPK",
                "DEEPSEEK_DEBUG_ATTN",
                "DEEPSEEK_DEBUG_MOE",
                "DEEPSEEK_DEBUG_LAYER0",
            )
        ):
            self._debug_prefill_dumps(embeds)

        t0 = time.perf_counter()
        embeds = jax.block_until_ready(embeds)
        t1 = time.perf_counter()
        tokens, n_gen = greedy_generate(
            self.params["lm"],
            cfg.lm,
            embeds,
            jnp.asarray(ids, jnp.int32)[None],
            max_new_tokens=max_new_tokens,
            ngram_size=ngram_size,
            eos_id=eos,
            capacity=capacity,
            kv_dtype=self.kv_dtype,
            **(sampling or {}),
        )
        tokens = jax.block_until_ready(tokens)
        t2 = time.perf_counter()

        total = prompt_len + int(n_gen[0])
        all_ids = np.asarray(tokens[0, :total]).tolist()
        gen_ids = all_ids[prompt_len:]
        if enabled("DEEPSEEK_DEBUG_TOKENS"):
            for step, tid in enumerate(gen_ids):
                piece = self.tokenizer.decode([int(tid)], skip_special_tokens=False)
                dbg_print("DEEPSEEK_DEBUG_TOKENS", f"step{step} next_id={tid} tok={piece!r}")
        text = decode_output(self.tokenizer, gen_ids, cfg.stop_string)
        if enabled("DEEPSEEK_DEBUG_OCR"):
            dbg_print(
                "DEEPSEEK_DEBUG_OCR",
                f"prompt_len={prompt_len} new_tokens={len(gen_ids)} capacity={capacity}",
            )
        return GenerationResult(
            text=text,
            token_ids=all_ids,
            prompt_len=prompt_len,
            prefill_seconds=t1 - t0,
            decode_seconds=t2 - t1,
            new_tokens=len(gen_ids),
        )
