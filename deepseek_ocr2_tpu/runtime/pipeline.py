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
import sys
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


@functools.partial(jax.jit, static_argnames=("cfg",))
def _debug_lm_prefill(lm_params, cfg, embeds, cache):
    from ..models.deepseek_v2 import lm_forward

    return lm_forward(lm_params, cfg, embeds, cache, pos=0, is_prefill=True)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _debug_lm_decode_step(lm_params, cfg, emb, cache, pos):
    from ..models.deepseek_v2 import lm_forward, logits_last

    hidden, cache = lm_forward(lm_params, cfg, emb, cache, pos=pos, is_prefill=False)
    return logits_last(lm_params, hidden), cache


@functools.partial(jax.jit, static_argnames=("cfg", "image_start", "act_dtype"))
def _vision_prefill(params, cfg: OCR2Config, input_ids, image_base, patches, image_start, act_dtype):
    image_base = ocr2.normalize_pixels(image_base, act_dtype)
    if patches is not None:
        patches = ocr2.normalize_pixels(patches, act_dtype)
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
        lookup_chunk: int = 0,
        device_resize: Union[bool, str, None] = None,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.kv_dtype = kv_dtype
        self.act_dtype = act_dtype
        # > 0 enables prompt-lookup speculative greedy decoding with this
        # chunk width (single-sequence, greedy only).
        self.lookup_chunk = lookup_chunk
        # Resize/letterbox/tile on device (PIL-bit-exact GEMM path) instead of
        # host PIL — breaks the 1-core host's resize ceiling in crop mode.
        # True = always, "auto" = only when cropping (the measured win), None
        # defers to the DEEPSEEK_DEVICE_RESIZE env flag ("auto"/"1"/"0").
        self.device_resize = device_resize

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

    def preprocess_host(
        self,
        image: Union[str, Image.Image],
        no_crop: bool = False,
        rotate: Optional[int] = 0,
        auto_rotate: bool = False,
    ) -> Dict[str, Any]:
        """Host-only preprocessing phase: decode, rotate, tiling decision,
        and (host path) the PIL resizes. Returns a dict consumed by
        `preprocess_finish`:

        - device path: {"mode": "device", "arr": HWC uint8 raw image, ...}
          — the raw pixels still need shipping + the on-device Catmull-Rom
          kernels; the serve prefetcher batches several pages into ONE
          device_put (the tunnel charges ~100 ms per transfer call) before
          calling preprocess_finish with the staged slice.
        - host path: {"mode": "host", "base": ..., "patches": ...} — ready
          arrays; finish just passes them through.
        """
        cfg = self.cfg
        img = Image.open(image).convert("RGB") if isinstance(image, str) else image.convert("RGB")

        rotate_used = rotate if rotate else 0
        if rotate_used == 0 and auto_rotate:
            rotate_used = auto_rotate_choice(img)
        dbg_print("DEEPSEEK_DEBUG_OCR", f"rotate_used={rotate_used}")
        img = rotate_image(img, rotate_used)

        from ..preprocess.image import (
            candidate_ratios,
            find_closest_aspect_ratio,
            preprocess_base_nchw,
            preprocess_base_u8,
            preprocess_tiles_nchw,
            preprocess_tiles_u8,
            use_native,
        )

        native = use_native()
        patches = None
        crop_ratio = (1, 1)
        cropping = should_crop(img, not no_crop, cfg.crop_image_size)
        if cropping:
            w, h = img.size
            ratios = candidate_ratios(cfg.min_crop_tiles, cfg.max_crop_tiles)
            crop_ratio = find_closest_aspect_ratio(
                w / h, ratios, w, h, cfg.crop_image_size
            )

        device = self.device_resize
        if device is None:
            import os

            env = os.environ.get("DEEPSEEK_DEVICE_RESIZE", "")
            device = "auto" if env == "auto" else env not in ("", "0")
        if device == "auto":
            # Measured (scripts/bench_serve_resize.py, 2200x1700 pages): the
            # device path wins only in crop mode (+49% serve pages/s), where
            # the host would do 7 resizes per page; at no-crop the single
            # host PIL resize beats shipping full-res pixels to the device
            # (3.38 vs 1.68 pages/s). "auto" = device iff cropping.
            device = cropping
        if device and not native:
            return {
                "mode": "device",
                "arr": np.asarray(img),
                "ratio": crop_ratio,
                "cropping": cropping,
                "rot": rotate_used,
            }

        if cropping:
            patches = (
                preprocess_tiles_nchw(img, cfg.crop_image_size, crop_ratio)
                if native
                else preprocess_tiles_u8(img, cfg.crop_image_size, crop_ratio)
            )

        image_base = (
            preprocess_base_nchw(img, cfg.base_image_size, cfg.pad_color)
            if native
            else preprocess_base_u8(img, cfg.base_image_size, cfg.pad_color)
        )
        return {
            "mode": "host",
            "base": image_base,
            "patches": patches,
            "ratio": crop_ratio,
            "rot": rotate_used,
        }

    def preprocess_finish(
        self, pre: Dict[str, Any], dev=None
    ) -> Tuple[np.ndarray, Optional[np.ndarray], Tuple[int, int], int]:
        """Device phase of preprocessing. `dev`: optional pre-staged
        bucket-padded device buffer for the device path (batched ship)."""
        cfg = self.cfg
        if pre["mode"] == "device":
            from ..preprocess.device_resize import device_preprocess_page

            image_base, patches = device_preprocess_page(
                pre["arr"],
                cfg.base_image_size,
                cfg.crop_image_size,
                pre["ratio"] if pre["cropping"] else None,
                cfg.pad_color,
                dev=dev,
            )
            return image_base, patches, pre["ratio"], pre["rot"]
        return pre["base"], pre["patches"], pre["ratio"], pre["rot"]

    def preprocess_image(
        self,
        image: Union[str, Image.Image],
        no_crop: bool = False,
        rotate: Optional[int] = 0,
        auto_rotate: bool = False,
    ) -> Tuple[np.ndarray, Optional[np.ndarray], Tuple[int, int], int]:
        """Returns (image_base [1,3,S,S], patches [P,3,c,c] or None,
        crop_ratio, rotate_used).

        Pixel arrays are uint8 (raw); every device prefill entry normalizes
        them on device (models.deepseek_ocr2.normalize_pixels) bit-identically
        to the host f32 path — shipping bytes instead of floats is 4x fewer
        host->device bytes. The opt-in native C++ path still returns
        host-normalized f32, which the same entries pass through unchanged.
        """
        return self.preprocess_finish(
            self.preprocess_host(
                image, no_crop=no_crop, rotate=rotate, auto_rotate=auto_rotate
            )
        )

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

        embeds = self.build_ocr_embeds(ids, image_base, patches, image_start)
        # Timing barrier: block_until_ready does not sync on the tunneled
        # platform; a tiny host transfer is the only reliable phase boundary.
        np.asarray(embeds[0, 0, :1])
        if enabled("DEEPSEEK_DEBUG_OCR"):
            self._debug_embeds_fingerprints(embeds)
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
                imgs = ocr2.normalize_pixels(jnp.asarray(imgs), jnp.float32)
                feats = sam_mod.sam_forward(self.params["sam"], cfg.sam, imgs)
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

    def _debug_embeds_fingerprints(self, embeds) -> None:
        """DEEPSEEK_DEBUG_OCR embedding fingerprints (reference
        main.rs:1477-1523): global stats, first-16 fingerprint, and 16-value
        slices at HF-comparable positions 0/1/last/289/545 (289 = after the
        288 local tokens of a 2-tile crop; 545 = after local+global)."""
        data = np.asarray(embeds, np.float32)  # [1, S, H]
        flat = data.reshape(-1)
        nan = int(np.isnan(flat).sum())
        finite = flat[~np.isnan(flat)]
        mn = float(finite.min()) if finite.size else float("nan")
        mx = float(finite.max()) if finite.size else float("nan")
        mean = float(finite.mean()) if finite.size else float("nan")
        dbg_print(
            "DEEPSEEK_DEBUG_OCR",
            f"inputs_embeds nan={nan} min={mn} max={mx} mean={mean}",
        )
        dbg_print("DEEPSEEK_DEBUG_OCR", f"inputs_embeds fingerprint={flat[:16].tolist()}")
        s = data.shape[1]

        def fp(pos):
            return data[0, pos, :16].tolist()

        if s >= 2:
            dbg_print("DEEPSEEK_DEBUG_OCR", f"inputs_embeds[pos0]={fp(0)}")
            dbg_print("DEEPSEEK_DEBUG_OCR", f"inputs_embeds[pos1]={fp(1)}")
            dbg_print("DEEPSEEK_DEBUG_OCR", f"inputs_embeds[pos_last]={fp(s - 1)}")
            if s > 289:
                dbg_print("DEEPSEEK_DEBUG_OCR", f"inputs_embeds[pos289]={fp(289)}")
            if s > 545:
                dbg_print("DEEPSEEK_DEBUG_OCR", f"inputs_embeds[pos545]={fp(545)}")

    def _dump_top10(self, logits_row: np.ndarray, label: str) -> None:
        order = np.argsort(-np.nan_to_num(logits_row, nan=-np.inf))[:10]
        toks = [self.tokenizer.decode([int(i)], skip_special_tokens=False) for i in order]
        dbg_print("DEEPSEEK_DEBUG_TOPK", f"{label} top10 ids={order.tolist()}")
        dbg_print("DEEPSEEK_DEBUG_TOPK", f"{label} top10 tok={toks}")
        dbg_print(
            "DEEPSEEK_DEBUG_TOPK",
            f"{label} top10 logit={[round(float(logits_row[i]), 4) for i in order]}",
        )

    def _debug_prefill_dumps(self, embeds) -> None:
        """Reference debug channels: step-0 top-10 logits (DEEPSEEK_DEBUG_TOPK,
        main.rs:954-980) and the eager per-layer dumps (ATTN/MOE/LAYER0)."""
        from ..models.deepseek_v2 import lm_forward_debug, logits_last as _ll

        hidden = lm_forward_debug(self.params["lm"], self.cfg.lm, embeds)
        if enabled("DEEPSEEK_DEBUG_TOPK"):
            logits = np.asarray(_ll(self.params["lm"], hidden)[0], np.float32)
            self._dump_top10(logits, "step0")

    def _generate_debug_topk(
        self, embeds, ids, max_new_tokens, ngram_size, eos
    ) -> GenerationResult:
        """Greedy decode with per-step top-10 logit dumps (DEEPSEEK_DEBUG_TOPK).

        Host-stepped (one dispatch per token) so every step's logits can be
        read back — debugging only; token-identical to the jitted loop."""
        from ..models.deepseek_v2 import lm_forward, logits_last, vocab_size_of
        from ..ops.sampling import greedy_pick, ngram_ban_mask
        from .kv_cache import make_kv_cache

        cfg = self.cfg
        lm = self.params["lm"]
        prompt_len = len(ids)
        capacity = bucket_capacity(prompt_len + max_new_tokens)
        vocab = vocab_size_of(lm)

        t0 = time.perf_counter()
        cache = make_kv_cache(
            cfg.lm.num_hidden_layers,
            1,
            cfg.lm.num_attention_heads,
            capacity,
            cfg.lm.head_dim,
            dtype=self.kv_dtype if self.kv_dtype.startswith("int8") else jnp.dtype(self.kv_dtype),
        )
        hidden, cache = _debug_lm_prefill(lm, cfg.lm, embeds, cache)
        logits = logits_last(lm, hidden)
        t1 = time.perf_counter()

        all_ids = list(ids)
        buf = np.zeros((capacity,), np.int32)
        buf[:prompt_len] = ids
        for step in range(max_new_tokens):
            logits_h = np.asarray(logits[0], np.float32)
            self._dump_top10(logits_h, f"step{step}")
            ban = ngram_ban_mask(
                jnp.asarray(buf), jnp.int32(len(all_ids)), ngram_size, vocab
            )
            tok = int(greedy_pick(jnp.asarray(logits_h), ban))
            buf[len(all_ids)] = tok
            all_ids.append(tok)
            if enabled("DEEPSEEK_DEBUG_TOKENS"):
                piece = self.tokenizer.decode([tok], skip_special_tokens=False)
                dbg_print(
                    "DEEPSEEK_DEBUG_TOKENS", f"step{step} next_id={tok} tok={piece!r}"
                )
            if tok == eos or step == max_new_tokens - 1:
                break
            emb = jnp.take(lm["embed"], jnp.asarray([[tok]], jnp.int32), axis=0).astype(
                embeds.dtype
            ).reshape(1, 1, -1)
            logits, cache = _debug_lm_decode_step(
                lm, cfg.lm, emb, cache, jnp.int32(len(all_ids) - 1)
            )
        t2 = time.perf_counter()

        gen_ids = all_ids[prompt_len:]
        text = decode_output(self.tokenizer, gen_ids, cfg.stop_string)
        return GenerationResult(
            text=text,
            token_ids=all_ids,
            prompt_len=prompt_len,
            prefill_seconds=t1 - t0,
            decode_seconds=t2 - t1,
            new_tokens=len(gen_ids),
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
        if enabled("DEEPSEEK_DEBUG_TOPK") and not sampling:
            # Beyond-reference: the reference dumps top-10 at step 0 only
            # (main.rs:1103-1129, 1529-1555); for HF bring-up we also dump
            # every decode step on a host-stepped greedy loop.
            return self._generate_debug_topk(embeds, ids, max_new_tokens, ngram_size, eos)

        t0 = time.perf_counter()
        # Host-transfer barrier (block_until_ready does not sync here).
        np.asarray(embeds[0, 0, :1])
        t1 = time.perf_counter()
        if self.lookup_chunk > 1 and not sampling:  # chunk 1 == plain greedy
            from .generate import lookup_greedy_generate

            tokens, n_gen, lookup_steps = lookup_greedy_generate(
                self.params["lm"],
                cfg.lm,
                embeds,
                jnp.asarray(ids, jnp.int32)[None],
                max_new_tokens=max_new_tokens,
                ngram_size=ngram_size,
                eos_id=eos,
                capacity=bucket_capacity(
                    prompt_len + max_new_tokens + self.lookup_chunk - 1
                ),
                kv_dtype=self.kv_dtype,
                chunk=self.lookup_chunk,
                return_steps=True,
            )
        else:
            lookup_steps = None
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
        # Full host transfer doubles as the decode barrier.
        tokens = np.asarray(tokens)
        n_gen = np.asarray(n_gen)
        t2 = time.perf_counter()
        if lookup_steps is not None:
            steps_v = max(int(np.asarray(lookup_steps)), 1)
            print(
                f"[lookup-decode: {int(n_gen[0])} tokens in {steps_v} forwards "
                f"= {int(n_gen[0]) / steps_v:.2f} tok/forward]",
                file=sys.stderr,
            )

        total = prompt_len + int(n_gen[0])
        all_ids = tokens[0, :total].tolist()
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
